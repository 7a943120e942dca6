package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline — the reason this engine
  * has an LLM tier: raw corpus → exact dedup → near-dup drop → quality
  * gate → clean corpus. Every stage is the scale-safe operator built
  * elsewhere ([[Dedup]], [[TextOps]]); this composes them in the canonical
  * order (dedup before quality, so quality never resurrects a duplicate's
  * twin) and is verified end-to-end against a DuckDB oracle of the same
  * composition.
  */
object Curation {

  /** @param minTokens    drop docs shorter than this many tokens
    * @param minQuality   drop docs scoring below [[TextOps.qualityScore]]
    * @param nearDupJaccard near-dup threshold for the keep-first drop
    */
  def curate(df: DataFrame, id: String, textCol: String,
             minTokens: Int = 20, minQuality: Double = 0.5,
             nearDupJaccard: Double = 0.8): DataFrame = {
    val base = featuredNarrow(df, id, textCol)
    val nearL = Dedup.nearDupPairs(exactSurvivorText(df, base, id, textCol),
        id, textCol, nearDupJaccard)
      .select(col("id_b").as(id)).distinct()
    base.filter(!col("exact_loser"))
      .join(nearL, Seq(id), "left_anti")
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
      .select(col(id), col("n_tokens"), col("quality_score"))
  }

  /** The per-stage builders [[curateResumable]] persists one at a time
    * (the non-resumable paths fuse them via [[featuredNarrow]] instead).
    */
  private def exactStage(df: DataFrame, id: String, textCol: String): DataFrame =
    df.join(
      Dedup.exactDedupMap(df, id, textCol)
        .filter(!col("is_duplicate")).select(col(id)),
      Seq(id), "left_semi")

  private def nearStage(df: DataFrame, id: String, textCol: String,
                        nearDupJaccard: Double): DataFrame =
    Dedup.dropNearDups(df, id, textCol, nearDupJaccard)

  private def qualityStage(df: DataFrame, id: String, textCol: String,
                           minTokens: Int, minQuality: Double): DataFrame = {
    val text: Column = col(textCol)
    df.select(col(id),
        TextOps.tokenCount(text).as("n_tokens"),
        TextOps.qualityScore(text).as("quality_score"))
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
  }

  /** Resumable curation: every stage persists its survivors under
    * `stageDir/<stage>`, and a re-run resumes from the last stage whose
    * output already exists (checked via the Hadoop FileSystem `_SUCCESS`
    * marker, so the same code short-circuits on HDFS/object stores at
    * cluster scale). The re-run cost of a 100 TB curation job after a
    * downstream-stage failure is then the failed stage only, not the
    * whole dedup chain.
    */
  def curateResumable(df: DataFrame, id: String, textCol: String, stageDir: String,
                      minTokens: Int = 20, minQuality: Double = 0.5,
                      nearDupJaccard: Double = 0.8): DataFrame = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    // a stageDir binds to one (input, thresholds) run, like a streaming
    // checkpoint dir; the threshold fingerprint is enforced so a re-run
    // with different parameters fails fast instead of silently returning
    // stages persisted under the old ones (the input is the caller's
    // responsibility — fingerprinting 100 TB of text is not)
    val params = s"minTokens=$minTokens,minQuality=$minQuality,nearDupJaccard=$nearDupJaccard"
    val pMarker = new org.apache.hadoop.fs.Path(stageDir, "_params")
    val fs = pMarker.getFileSystem(conf)
    if (fs.exists(pMarker)) {
      val in = fs.open(pMarker)
      val existing = try scala.io.Source.fromInputStream(in).mkString finally in.close()
      require(existing == params,
        s"stageDir $stageDir was built with [$existing], requested [$params] — use a fresh dir")
    } else {
      val out = fs.create(pMarker, true)
      try out.write(params.getBytes("UTF-8")) finally out.close()
    }
    def path(stage: String) = s"$stageDir/$stage"
    def done(stage: String): Boolean = {
      val marker = new org.apache.hadoop.fs.Path(path(stage), "_SUCCESS")
      marker.getFileSystem(conf).exists(marker)
    }
    def materialize(stage: String, build: => DataFrame): DataFrame = {
      if (!done(stage)) build.write.mode("overwrite").parquet(path(stage))
      spark.read.parquet(path(stage))
    }
    val exact = materialize("exact_dedup", exactStage(df, id, textCol))
    val near = materialize("near_dedup", nearStage(exact, id, textCol, nearDupJaccard))
    materialize("quality_gate", qualityStage(near, id, textCol, minTokens, minQuality))
  }

  /** The exact-dedup-labelled stats frame every non-resumable entry point
    * shares: `(id, n_tokens, quality_score, exact_loser)` — one fingerprint
    * window, checkpointed. NARROW on purpose (round-13; optimization guide
    * §8 "decide with small rows, move big rows once", §2.3 "shuffle fewer
    * bytes"): the round-12 featuredBase carried the corpus TEXT through the
    * fingerprint exchange and localCheckpoint'ed it — a corpus-volume
    * shuffle plus a corpus-volume materialization for what is a
    * duplicate-count-sized decision. Now only `(id, fp, 2 stats)` enters
    * the window exchange and the pinned frame, and the near-dup chain
    * re-reads the text with one extra narrow scan instead
    * ([[exactSurvivorText]]). Requires unique `id` per row, like the rest
    * of the tier (ADVICE r12).
    */
  private def featuredNarrow(df: DataFrame, id: String, textCol: String): DataFrame = {
    val text: Column = col(textCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")
    df.select(col(id),
        TextOps.fingerprintMd5(text).as("fingerprint"),
        TextOps.tokenCount(text).as("n_tokens"),
        TextOps.qualityScore(text).as("quality_score"))
      .withColumn("exact_loser", col(id) =!= min(col(id)).over(w))
      .select(col(id), col("n_tokens"), col("quality_score"), col("exact_loser"))
      .localCheckpoint(false)
  }

  /** The exact-dedup SURVIVORS' `(id, text)` for the near-dup chain: a
    * fresh narrow text scan anti-joined against the LOSER ids read off the
    * pinned stats frame — loser-sized (≪ corpus, the tier's premise), so
    * the join broadcasts and the corpus text never shuffles or
    * materializes anywhere in the curation pipeline.
    */
  private def exactSurvivorText(df: DataFrame, base: DataFrame, id: String,
                                textCol: String): DataFrame =
    df.select(col(id), col(textCol))
      .join(base.filter(col("exact_loser")).select(col(id)), Seq(id), "left_anti")

  /** [[curate]] under a per-doc near-dup verify budget
    * ([[Dedup.nearDupLoserIdsCapped]]): identical rows to [[curate]] on
    * ANY input — the overflow fallback keeps the drop set exact, so the
    * same DuckDB oracle verifies both — but the verify stage over a
    * duplication-SATURATED region costs O(budget·n) instead of O(Σ
    * family²). This is the operating mode for the saturated tails a
    * 100 TB curation run meets (SCALE.md sf10: 359 s saturated vs 28.9 s
    * constant-rate for the uncapped form — the entire gap is family-pair
    * verify mass, which the budget removes).
    */
  def curateCapped(df: DataFrame, id: String, textCol: String,
                   minTokens: Int = 20, minQuality: Double = 0.5,
                   nearDupJaccard: Double = 0.8, budget: Int = 8): DataFrame = {
    val base = featuredNarrow(df, id, textCol)
    val losers = Dedup.nearDupLoserIdsCapped(
      exactSurvivorText(df, base, id, textCol), id, textCol, nearDupJaccard,
      budget = budget)
    base.filter(!col("exact_loser"))
      .join(losers, Seq(id), "left_anti")
      .filter(col("n_tokens") >= minTokens && col("quality_score") >= minQuality)
      .select(col(id), col("n_tokens"), col("quality_score"))
  }

  /** Every doc labelled with the FIRST pipeline stage that drops it
    * (`exact_dup_loser` → `near_dup_loser` → `quality_fail`) or
    * `survivor` — the single-pass basis for the funnel and for per-stage
    * drop accounting. Unlike unioning the four stage frames (which
    * re-plans each pipeline prefix — the document scan and fingerprint
    * window three times, the LSH verify chain twice), every upstream job
    * here runs once ([[featuredNarrow]] + one LSH chain).
    */
  /** Exit-stage labels WITH the per-doc features (internal: exitStages
    * projects the gate contract's two columns; curateObserved keeps the
    * features so survivors need no re-join).
    */
  private def labeledStages(df: DataFrame, id: String, textCol: String,
                            minTokens: Int, minQuality: Double,
                            nearDupJaccard: Double): DataFrame = {
    val base = featuredNarrow(df, id, textCol)
    val nearL = Dedup.nearDupPairs(exactSurvivorText(df, base, id, textCol),
        id, textCol, nearDupJaccard)
      .select(col("id_b").as(id)).distinct()
    base.join(nearL.withColumn("near_loser", lit(true)), Seq(id), "left")
      .select(col(id), col("n_tokens"), col("quality_score"),
        when(col("exact_loser"), lit("exact_dup_loser"))
          .when(coalesce(col("near_loser"), lit(false)), lit("near_dup_loser"))
          .when(!(col("n_tokens") >= minTokens &&
            col("quality_score") >= minQuality), lit("quality_fail"))
          .otherwise(lit("survivor")).as("exit_stage"))
  }

  def exitStages(df: DataFrame, id: String, textCol: String,
                 minTokens: Int = 20, minQuality: Double = 0.5,
                 nearDupJaccard: Double = 0.8): DataFrame =
    labeledStages(df, id, textCol, minTokens, minQuality, nearDupJaccard)
      .select(col(id), col("exit_stage"))

  /** [[curate]] with free telemetry: the returned frame carries an
    * `Observation` whose funnel counters (input / exact_dedup / near_dedup
    * / quality_gate) are recorded ON THE SAME ACTION that materializes the
    * result — the accumulators ride the job, so a production curation run
    * gets its stage accounting with ZERO extra jobs (vs [[curateStats]]'
    * separate aggregate). Read `observation.get` after any full action on
    * the frame.
    */
  def curateObserved(df: DataFrame, id: String, textCol: String,
                     minTokens: Int = 20, minQuality: Double = 0.5,
                     nearDupJaccard: Double = 0.8): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val result = labeledStages(df, id, textCol, minTokens, minQuality, nearDupJaccard)
      .observe(obs,
        count(lit(1)).as("input"),
        count(when(col("exit_stage") =!= "exact_dup_loser", lit(1)))
          .as("exact_dedup"),
        count(when(!col("exit_stage").isin("exact_dup_loser", "near_dup_loser"),
          lit(1))).as("near_dedup"),
        count(when(col("exit_stage") === "survivor", lit(1))).as("quality_gate"))
      .filter(col("exit_stage") === "survivor")
      .select(col(id), col("n_tokens"), col("quality_score"))
    (result, obs)
  }

  /** The four funnel counts as ONE aggregate row over the exit-stage
    * labels: each stage's survivor count is the docs that made it PAST
    * every earlier drop — a running subtraction expressed as conditional
    * counts, so the whole funnel is one job.
    */
  private def funnelAgg(labels: DataFrame): DataFrame =
    labels.agg(
      count(lit(1)).as("input"),
      count(when(col("exit_stage") =!= "exact_dup_loser", lit(1))).as("exact_dedup"),
      count(when(!col("exit_stage").isin("exact_dup_loser", "near_dup_loser"), lit(1)))
        .as("near_dedup"),
      count(when(col("exit_stage") === "survivor", lit(1))).as("quality_gate"))

  /** Per-stage survivor counts — the curation funnel a pipeline operator
    * watches ("silent caps" made loud: how many docs each stage dropped).
    * ONE action over the single-pass labels, not four sequential counts.
    */
  def curateStats(df: DataFrame, id: String, textCol: String,
                  minTokens: Int = 20, minQuality: Double = 0.5,
                  nearDupJaccard: Double = 0.8): Seq[(String, Long)] = {
    val r = funnelAgg(exitStages(df, id, textCol, minTokens, minQuality, nearDupJaccard))
      .head()
    Seq("input" -> r.getLong(0), "exact_dedup" -> r.getLong(1),
      "near_dedup" -> r.getLong(2), "quality_gate" -> r.getLong(3))
  }

  /** The funnel as ONE DataFrame (`stage, n_docs`) — the single aggregate
    * row pivoted to four rows, no driver-side actions, so it registers in
    * the correctness gate and ships as a side output of a curation run.
    */
  def funnel(df: DataFrame, id: String, textCol: String,
             minTokens: Int = 20, minQuality: Double = 0.5,
             nearDupJaccard: Double = 0.8): DataFrame = {
    val stageCols = Seq("input", "exact_dedup", "near_dedup", "quality_gate")
    funnelAgg(exitStages(df, id, textCol, minTokens, minQuality, nearDupJaccard))
      .select(explode(array(stageCols.map(s =>
        struct(lit(s).as("stage"), col(s).as("n_docs"))): _*)).as("f"))
      .select(col("f.stage"), col("f.n_docs"))
      .orderBy("stage")
  }
}
