package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators for a large-scale training-data pipeline:
  * deterministic stratified sampling, token-budget shard packing, and
  * benchmark decontamination — the steps between "curated corpus" and
  * "training shards" that the dedup/quality tier ([[Curation]]) feeds.
  *
  * Everything is deterministic and partitioning-independent (md5-derived
  * hashes, id-ordered windows), so a re-run on any cluster layout produces
  * the identical sample/packing — and the DuckDB oracle can reproduce it
  * bit-for-bit.
  */
object Corpus {

  /** Deterministic per-row bucket in [0, 1000): md5-derived from the salted
    * id, so the keep decision is a pure function of the row — no RNG, no
    * partitioning dependence; sampling 100 TB is a narrow filter.
    */
  def sampleHash(idCol: Column, salt: String): Column =
    pmod(TextOps.hash60(concat(lit(salt + ":"), idCol.cast("string"))), lit(1000L))

  /** Full-width deterministic priority hash (60 bits, not quantized): the
    * per-row sort key for "random but reproducible" orderings — quota caps,
    * shard shuffling. Same md5 derivation as [[sampleHash]], so the oracle
    * reproduces it bit-for-bit.
    */
  def priorityHash(idCol: Column, salt: String): Column =
    TextOps.hash60(concat(lit(salt + ":"), idCol.cast("string")))

  /** Per-source quota cap (the web-crawl "max N pages per domain" rule):
    * within each source, docs are ranked by (priority hash, id) and only the
    * first `cap` survive — a uniform random-but-deterministic choice, not
    * "whatever N arrived first". One window per source partition; at 100 TB
    * the source key is the natural partition key and a hot source (one domain
    * with millions of pages) still ranks inside its own partition — the
    * window never crosses sources, so skew stays bounded by the largest
    * single source, the same bound the cap itself is there to enforce.
    */
  def capPerSource(df: DataFrame, idCol: String, sourceCol: String,
                   cap: Int, salt: String = "cap"): DataFrame = {
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(priorityHash(col(idCol), salt), col(idCol))
    df.withColumn("keep_rank", row_number().over(w).cast("long"))
      .filter(col("keep_rank") <= cap)
  }

  /** Deterministic train/validation/test assignment: the salted hash bucket
    * (0–999) is cut at the cumulative fraction boundaries, so every doc's
    * split is a pure function of its id — stable across re-runs, cluster
    * layouts, and corpus growth (a doc never migrates between splits when
    * other docs are added). `fractions` are quantized to 1/1000 and assigned
    * in declaration order; the last split absorbs the remainder.
    */
  def assignSplits(df: DataFrame, idCol: String,
                   fractions: Seq[(String, Double)],
                   salt: String = "split"): DataFrame = {
    val (bucket, splitCol) = splitExpr(col(idCol), fractions, salt)
    df.withColumn("bucket", bucket).withColumn("split", splitCol)
  }

  /** The split assignment as pure (bucket, split) COLUMN expressions over
    * an id — usable anywhere an id column exists without joining back to
    * the corpus (the property [[splitLeakage]] exploits).
    */
  def splitExpr(idc: Column, fractions: Seq[(String, Double)],
                salt: String = "split"): (Column, Column) = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1: $fractions")
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + (f * 1000).round
    }.tail
    val bucket = sampleHash(idc, salt)
    val splitCol = fractions.init.zip(bounds.init)
      .foldRight(lit(fractions.last._1)) { case (((name, _), hi), acc) =>
        when(bucket < hi, lit(name)).otherwise(acc)
      }
    (bucket, splitCol)
  }

  /** Deterministic weighted sampling: each row survives with probability
    * `weight` (clamped to [0,1] by construction when the weight is a score
    * in that range), decided by comparing the salted id-hash bucket
    * against the weight quantized to 1/1000 — no RNG, so the sample is
    * reproducible across runs and layouts, and a row's fate never changes
    * as the corpus grows. The quality-weighted corpus sample (keep good
    * docs preferentially, keep SOME low-quality mass for robustness) is
    * this with weight = quality score. A narrow filter: zero shuffles.
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     salt: String = "wsample"): DataFrame =
    df.filter(sampleHash(col(idCol), salt) <
      round(weight * 1000).cast("long"))

  /** Train/val/test LEAKAGE audit: near-duplicate pairs that cross a split
    * boundary — an eval doc with a near-dup in train is contamination the
    * per-benchmark decontamination pass cannot see. Because the split is a
    * pure function of the id, both sides' splits are computed directly ON
    * the pair rows ([[splitExpr]]): zero joins and zero shuffles beyond
    * the near-dup pipeline itself, whose pair volume is bounded by actual
    * duplication.
    */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, fractions: Seq[(String, Double)],
                   salt: String = "split"): DataFrame =
    Dedup.nearDupPairs(df, idCol, textCol, threshold)
      .withColumn("split_a", splitExpr(col("id_a"), fractions, salt)._2)
      .withColumn("split_b", splitExpr(col("id_b"), fractions, salt)._2)
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("split_a"), col("id_b"), col("split_b"),
        col("jaccard"))

  /** Deterministic training-order shuffle as (shard, position) — the
    * scale-safe spelling of "globally shuffle the corpus": shard = hash mod
    * `numShards` distributes docs uniformly; position = rank of (hash, id)
    * within the shard randomizes intra-shard order. A literal global
    * row_number would serialize on one partition; this shape is one shuffle
    * on the shard key and N independent windows, and a training job reads
    * shards in shard/position order for the same permutation every run.
    */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
                    salt: String = "shuffle"): DataFrame = {
    val h = priorityHash(col(idCol), salt)
    val w = Window.partitionBy(col("shard")).orderBy(h, col(idCol))
    df.withColumn("shard", pmod(h, lit(numShards.toLong)))
      .withColumn("position", row_number().over(w).cast("long"))
  }

  /** Shard manifests (the data-integrity ledger a training job checks
    * before reading): per (stratum, shard) from [[packShards]]'s
    * assignment — doc count, exact token total, and an ORDER-SENSITIVE
    * content checksum (polynomial rolling hash of the docs' content
    * fingerprints in id order, the shard's read order). Any dropped,
    * duplicated, reordered, or edited doc changes the checksum; a re-run
    * on any cluster layout reproduces it bit-for-bit.
    *
    * Shape: the fold is expressed as a per-doc `h·B^(n−1−rank)` term
    * (two lookup tables, no interpreted lambdas — same trick as
    * [[TextOps.rollingHashAgg]]) summed in exact DECIMAL(38) per shard, so
    * the checksum is one window pass + one hash aggregate. Valid for
    * shards under 16384 docs — the token budget bounds docs per shard, so
    * size the budget accordingly at scale.
    */
  def shardManifest(df: DataFrame, idCol: String, strataCol: String,
                    textCol: String, tokensPerShard: Long): DataFrame = {
    val packed = packShards(df, idCol, strataCol, textCol, tokensPerShard)
      .join(df.select(col(idCol),
        (TextOps.hash60(TextOps.fingerprintMd5(col(textCol))) % TextOps.RollP)
          .as("h")), Seq(idCol))
    val w = Window.partitionBy(strataCol, "shard_id")
    val rank = row_number().over(w.orderBy(idCol)) // 1-based read order
    val k = count(lit(1)).over(w) - rank           // exponent n - 1 - (rank-1)
    packed
      .withColumn("term", col("h") * TextOps.polyPow(k) % TextOps.RollP)
      .groupBy(col(strataCol), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        (sum(col("term").cast("decimal(38,0)")) % TextOps.RollP)
          .cast("long").as("checksum"))
  }

  /** Per-doc novelty: the fraction of a doc's distinct word n-gram shingles
    * that occur in NO other document — high novelty marks content the corpus
    * has nowhere else (the diversity complement of the dedup tier, which
    * hunts the other tail). Shape: one shingle explode → shingle-frequency
    * aggregate → per-doc aggregate; never doc pairs. Docs shorter than `n`
    * tokens have no shingles and get a NULL novelty.
    */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 3): DataFrame = {
    val sh = Dedup.shingleRows(df, idCol, textCol, n)
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("sdf"))
    val per = sh.join(freq, Seq("shingle"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("sdf") === 1, lit(1))).as("n_unique"))
    df.select(col(idCol))
      .join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        when(col("n_shingles") > 0,
          col("n_unique").cast("double") / col("n_shingles")).as("novelty"))
  }

  /** Per-stratum deterministic sampling (corpus rebalancing): each stratum
    * keeps ~`rates(stratum)` of its rows (`defaultRate` for unlisted
    * strata), rates quantized to 1/1000. The standard mixture-tuning step
    * (up-weight scarce languages, down-sample the dominant one) as a single
    * codegen'd filter.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "sample"): DataFrame = {
    val rateCol = rates.toSeq.sortBy(_._1).foldLeft(lit((defaultRate * 1000).toLong)) {
      case (acc, (s, r)) =>
        when(col(strataCol) === s, lit((r * 1000).toLong)).otherwise(acc)
    }
    df.filter(sampleHash(col(idCol), salt) < rateCol)
  }

  /** Token-budget shard packing: docs are packed, in deterministic id order
    * within each stratum, into shards of ~`tokensPerShard` tokens —
    * `shard_id = floor(tokens-before-this-doc / budget)`. One shuffle on
    * the stratum key; the running sum is sequential per stratum BY DESIGN
    * (packing is order-defined), so at 100 TB the stratum is chosen fine
    * enough (lang × date bucket) that no single stratum serializes the job.
    * Exact while per-stratum token totals stay under 2^53 (~36 PB of text).
    */
  def packShards(df: DataFrame, idCol: String, strataCol: String,
                 textCol: String, tokensPerShard: Long,
                 carry: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(Seq(col(idCol), col(strataCol)) ++ carry.map(col) :+
        TextOps.tokenCount(col(textCol)).as("n_tokens"): _*)
      .withColumn("shard_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(tokensPerShard)))
  }

  /** Sequence packing: assemble each [[packShards]] shard into ONE training
    * row — the ordered concatenation of its documents with a separator —
    * plus the doc count and exact token total. The per-shard assembly is
    * an id-ordered array aggregate (sort_array over collected (id, text)
    * structs, deterministic regardless of partitioning); groups are
    * shard-sized (~tokensPerShard tokens) by construction, so the
    * interpreted transform at the group boundary touches a bounded number
    * of elements per row, never the corpus. The text rides THROUGH the
    * packing window (the `carry` hook) — no join back to the corpus; the
    * plan is the packing shuffle plus the (stratum, shard) aggregate.
    */
  def packSequences(df: DataFrame, idCol: String, strataCol: String,
                    textCol: String, tokensPerShard: Long,
                    sep: String = "\n\n"): DataFrame =
    packShards(df, idCol, strataCol, textCol, tokensPerShard,
        carry = Seq(textCol))
      .groupBy(col(strataCol), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(idCol).as("i"),
              col(textCol).as("t")))),
            x => x.getField("t")),
          sep).as("packed_text"))

  /** Training-mixture plan: per stratum, the achieved token share vs a
    * declared target share, the upsample factor that would hit the target,
    * and the keep probability for a downsample-only rebalance
    * (`min(1, target/share)` — strata at or under target keep everything).
    * The feed-forward step for [[stratifiedSample]]: its `rates` map is this
    * frame's `keep_prob` column.
    *
    * Shape: one hash aggregate on the stratum key + a broadcast 1-row total
    * (stays in the plan — no driver action). Shares and factors are single
    * IEEE divisions over exact integer token counts, so the output is
    * partitioning-invariant and oracle-exact.
    */
  def mixtureWeights(df: DataFrame, strataCol: String, textCol: String,
                     targets: Map[String, Double], defaultTarget: Double): DataFrame = {
    val per = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val total = per.select(sum("n_tokens").as("total_tokens"))
    val targetCol = targets.toSeq.sortBy(_._1).foldLeft(lit(defaultTarget)) {
      case (acc, (s, t)) => when(col(strataCol) === s, lit(t)).otherwise(acc)
    }
    per.crossJoin(broadcast(total))
      .withColumn("token_share",
        col("n_tokens").cast("double") / col("total_tokens"))
      .withColumn("target_share", targetCol)
      .withColumn("upsample_factor", col("target_share") / col("token_share"))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        col("token_share"), col("target_share"), col("upsample_factor"),
        least(lit(1.0), col("upsample_factor")).as("keep_prob"))
  }

  /** Apply [[mixtureWeights]] as the DOWN-sampling pass that actually
    * rebalances the corpus toward the target mixture: every stratum keeps
    * a deterministic hash-sampled `keep_prob` fraction of its docs, so
    * over-represented strata shed token share while under-represented
    * ones keep everything (their upsample factor is an epoch-count /
    * repetition decision downstream — a row filter cannot create data).
    * keep_prob is quantized to millesimal ONCE (floor, matching the
    * sample-hash granularity) so the keep decision is pure integer
    * compare — the same md5-derived decision [[stratifiedSample]] makes,
    * with the rates COMPUTED from the measured mixture instead of passed
    * in.
    *
    * Scale shape: one stratum-cardinality aggregate (the weights), one
    * broadcast join of the ≤|strata|-row rate table, one narrow filter —
    * rebalancing 100 TB costs one scan plus the mixture pass, zero
    * additional shuffles of the corpus itself.
    */
  def mixtureResample(df: DataFrame, idCol: String, strataCol: String,
                      textCol: String, targets: Map[String, Double],
                      defaultTarget: Double, salt: String = "mix"): DataFrame = {
    val rates = mixtureWeights(df, strataCol, textCol, targets, defaultTarget)
      .select(col(strataCol),
        floor(col("keep_prob") * 1000).cast("long").as("__keep_mil"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(sampleHash(col(idCol), salt) < col("__keep_mil"))
      .drop("__keep_mil")
  }

  /** Benchmark decontamination scores: for every corpus doc, the fraction
    * of its word n-gram shingles that appear ANYWHERE in the benchmark set
    * (containment, the standard eval-leak test — Jaccard would dilute a
    * fully-contained short doc against a large benchmark). Docs shorter
    * than `n` tokens have no shingles and are the exact-dedup tier's job.
    *
    * Shape: benchmark shingles are distinct-reduced first (benchmarks are
    * tiny next to the corpus, so the join side broadcasts / AQE picks), the
    * corpus side is one shingle explode → left join → per-doc aggregate —
    * never doc×doc pairs.
    */
  /** Pairwise SOURCE-level Jaccard similarity over distinct shingle sets —
    * the mixture-design overlap audit (which sources are near-copies of
    * each other, which are genuinely novel; the source-granularity
    * complement of per-doc dedup and of benchmark decontamination). The
    * document-unique window builds shingles per doc (never across doc
    * boundaries); the source column rides the same projection, so the
    * distinct `(source, shingle)` frame costs ONE aggregate at shingle
    * cardinality. The self-join is keyed on the shingle: candidate volume
    * is Σ per-shingle |sources|² ≤ S²·|shingles| with S = #sources (tens
    * at any corpus size) — never doc-quadratic. Set sizes ride a broadcast
    * of the S-row size frame; the checkpoint pins the shingle set against
    * the sizes/self-join diamond. Output: `(src_a, src_b, n_common, n_a,
    * n_b, jaccard)` for pairs with at least one shared shingle,
    * src_a < src_b.
    */
  def sourceSimilarity(docs: DataFrame, id: String, source: String,
                       textCol: String, n: Int = 3): DataFrame = {
    // per-doc grams in one narrow codegen'd pass (round-12: the
    // [[graft.functions.ShingleQ]] kernel — no posexplode → exchange+sort
    // on the doc id → lead chain); in-kernel per-doc dedup shrinks the
    // (src, shingle)-distinct's input, and distinct-of-per-doc-distinct is
    // the same (src, shingle) set the window form produced
    val ss = docs.select(col(source).as("src"),
        explode(graft.functions.ShingleQ(
          TextOps.tokens(col(textCol)), n, "|", distinct = true)).as("shingle"))
      .distinct()
      .localCheckpoint()
    val sizes = ss.groupBy(col("src")).agg(count(lit(1)).as("n_sh"))
    ss.as("a").join(ss.as("b"), "shingle")
      .filter(col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("src").as("src_a"),
        col("n_sh").as("n_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("src").as("src_b"),
        col("n_sh").as("n_b"))), Seq("src_b"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .select("src_a", "src_b", "n_common", "n_a", "n_b", "jaccard")
      .orderBy("src_a", "src_b")
  }

  def contaminationScores(corpus: DataFrame, benchmark: DataFrame, id: String,
                          textCol: String, n: Int = 3): DataFrame = {
    val bsh = Dedup.shingleRows(benchmark, id, textCol, n)
      .select(col("shingle")).distinct()
      .withColumn("hit", lit(true))
    Dedup.shingleRows(corpus, id, textCol, n)
      .join(bsh, Seq("shingle"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("hit"), lit(1))).as("n_overlap"))
      .select(col(id), col("n_shingles"), col("n_overlap"),
        (col("n_overlap").cast("double") / col("n_shingles")).as("containment"))
  }

  /** Embedding-tier decontamination: each corpus vector's maximum cosine
    * against the benchmark set, flagged at `threshold` — catches eval leaks
    * that survive paraphrase (where n-gram containment goes blind). Same
    * shape as the brute-force search baseline: broadcast the (small)
    * benchmark side, one narrow scoring pass over the corpus, per-partition
    * partial max — no corpus self-join, exact quantized-integer arithmetic.
    */
  def embeddingContamination(corpus: DataFrame, benchmark: DataFrame,
                             id: String, vec: String,
                             threshold: Double): DataFrame = {
    val c = Similarity.prepare(corpus, id, vec)
      .select(col(id), col("q").as("cq"), col("n2").as("cn2"))
    val b = Similarity.prepare(benchmark, id, vec)
      .select(col("q").as("bq"), col("n2").as("bn2"))
    c.crossJoin(broadcast(b))
      .select(col(id),
        Similarity.cosineQ(Similarity.dotQ(col("cq"), col("bq")),
          col("cn2"), col("bn2")).as("cosine"))
      .groupBy(col(id))
      .agg(max(col("cosine")).as("max_cosine"))
      .select(col(id), col("max_cosine"),
        (col("max_cosine") >= threshold).as("is_contaminated"))
  }
}
