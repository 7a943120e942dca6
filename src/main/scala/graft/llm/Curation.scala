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
             nearDupJaccard: Double = 0.8): DataFrame =
    stages(df, id, textCol, minTokens, minQuality, nearDupJaccard).last._2

  /** The pipeline with its intermediate frames, in order — the basis for
    * per-stage drop accounting ([[curateStats]]) and stage-level reuse.
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

  def stages(df: DataFrame, id: String, textCol: String,
             minTokens: Int = 20, minQuality: Double = 0.5,
             nearDupJaccard: Double = 0.8): Seq[(String, DataFrame)] = {
    val exactKept = exactStage(df, id, textCol)
    val nearKept = nearStage(exactKept, id, textCol, nearDupJaccard)
    val curated = qualityStage(nearKept, id, textCol, minTokens, minQuality)
    Seq("input" -> df, "exact_dedup" -> exactKept,
      "near_dedup" -> nearKept, "quality_gate" -> curated)
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

  /** Per-stage survivor counts — the curation funnel a pipeline operator
    * watches ("silent caps" made loud: how many docs each stage dropped).
    */
  def curateStats(df: DataFrame, id: String, textCol: String,
                  minTokens: Int = 20, minQuality: Double = 0.5,
                  nearDupJaccard: Double = 0.8): Seq[(String, Long)] =
    stages(df, id, textCol, minTokens, minQuality, nearDupJaccard)
      .map { case (name, frame) => name -> frame.count() }

  /** The funnel as ONE DataFrame (`stage, n_docs`) — a lazy union of the
    * four stage counts, no driver-side actions, so it registers in the
    * correctness gate and ships as a side output of a curation run.
    */
  def funnel(df: DataFrame, id: String, textCol: String,
             minTokens: Int = 20, minQuality: Double = 0.5,
             nearDupJaccard: Double = 0.8): DataFrame =
    stages(df, id, textCol, minTokens, minQuality, nearDupJaccard)
      .map { case (name, frame) =>
        frame.agg(count(lit(1)).as("n_docs")).select(lit(name).as("stage"), col("n_docs"))
      }
      .reduce(_ union _)
      .orderBy("stage")
}
