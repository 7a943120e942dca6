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
                 textCol: String, tokensPerShard: Long): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(strataCol),
        TextOps.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("shard_id",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / lit(tokensPerShard)))
  }

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
