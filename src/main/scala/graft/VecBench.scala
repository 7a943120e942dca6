package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vector-fixture dedup benchmark with the CONFIG stamped into the artifact
  * (round-10 verdict #3: a committed scale claim whose artifact doesn't
  * state its threshold/width is a claim half-filed — the 6.3M reading could
  * not be reconciled with SCALE.md's numbers because the configurations
  * were in the shell history, not the file).
  *
  * Runs the SRP dedup/pair forms over `SPARK_GRAFT_SF_DIR`'s embeddings
  * table at explicit configurations and prints ONE JSON line where every
  * run carries `{form, threshold, rows_per_band (chosen), width_mode,
  * target_bucket, n, out, sec}`.
  *
  * Config: `SPARK_GRAFT_VEC_RUNS` — comma-separated `form:threshold:width`
  * where form ∈ {bucket, pairs}, width ∈ {auto, <bits>}. Default runs the
  * production point (`bucket:0.35:auto`). Runs execute in order; with
  * `SPARK_GRAFT_VEC_WARMUP=1` each spec runs once untimed first (JVM +
  * page-cache warmup — the steady-state number; without it the first
  * touch of a multi-GB fixture on a degraded-storage host dominates the
  * reading, measured 173 s vs 41 s warmed at 6.3M on the same build).
  * The artifact carries an `io_probe_sec` field (16 fsync'd 256 KiB
  * writes, the Bench io-canary shape) so a storage-sick host names
  * itself in the file.
  */
object VecBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_vec632k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runsSpec = sys.env.getOrElse("SPARK_GRAFT_VEC_RUNS", "bucket:0.35:auto")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val dim = graft.llm.SimilarityCatalog.Dim
    val targetBucket = 64L
    val warmup = sys.env.get("SPARK_GRAFT_VEC_WARMUP").contains("1")

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def ioProbe(): Double = {
      import java.nio.file.{Files => NF, StandardOpenOption => O}
      val dir = NF.createTempDirectory("graft-vec-iocanary")
      val buf = java.nio.ByteBuffer.allocate(256 * 1024)
      val t0 = System.nanoTime()
      (0 until 16).foreach { i =>
        buf.rewind()
        val ch = java.nio.channels.FileChannel.open(dir.resolve(s"f$i"), O.CREATE, O.WRITE)
        try { ch.write(buf); ch.force(true) } finally ch.close()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      dir.toFile.listFiles.foreach(_.delete()); dir.toFile.delete()
      sec
    }
    val ioSec = ioProbe()

    def runSpec(spec: String): (String, Double, Int, String, Long) = {
      val Array(form, thrS, widthS) = spec.split(":")
      val thr = thrS.toDouble
      val (rpb, out) = (form, widthS) match {
        case ("bucket", "auto") =>
          val (w, d) = graft.llm.Srp.semanticDedupSrpBucketAuto(
            emb, "vec_id", "embedding", dim, thr, targetBucket)
          (w, d.filter(!col("is_kept")).count())
        case ("bucket", w) =>
          (w.toInt, graft.llm.Srp.semanticDedupSrpBucketWidth(
            emb, "vec_id", "embedding", dim, thr, w.toInt)
            .filter(!col("is_kept")).count())
        case ("pairs", "auto") =>
          val (w, d) = graft.llm.Srp.nearDupPairsSrpAuto(
            emb, "vec_id", "embedding", dim, thr, targetBucket)
          (w, d.count())
        case other => sys.error(s"unknown run spec: $other")
      }
      // release each run's checkpointed frames so runs don't squeeze each
      // other's execution memory (the Bench session-hygiene rule)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (form, thr, rpb, widthS, out)
    }

    val results = runsSpec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { spec =>
      if (warmup) runSpec(spec)
      val t0 = System.nanoTime()
      val (form, thr, rpb, widthS, out) = runSpec(spec)
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"form":"$form","threshold":$thr,"rows_per_band":$rpb,""" +
        s""""width_mode":"$widthS","target_bucket":$targetBucket,""" +
        s""""warmed":$warmup,"n":$n,"out":$out,"sec":${fmt(sec)}}"""
    }
    println(s"""{"metric":"vec_dedup","unit":"sec","sf":"$sfDir","n":$n,"dim":$dim,"io_probe_sec":${fmt(ioSec)},"runs":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
