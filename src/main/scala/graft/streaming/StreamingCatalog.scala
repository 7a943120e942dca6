package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.engine.Catalog
import graft.shopping.EnrichCatalog

/** Driver-contract registration that runs the REAL streaming path inside
  * the correctness gate: replay the events table through a file-source
  * readStream → enrichment → checkpointed parquet sink, then hand the sink
  * back as the query result. The oracle is the SAME SQL as the batch
  * `enriched_orders` query — proving stream output ≡ batch output ≡ oracle
  * on the full table, not just in unit tests.
  */
object StreamingCatalog extends Catalog {

  /** events.parquet carries TIMESTAMP(NANOS); streams must declare schemas,
    * so read ns-longs and convert exactly like Tables.events.
    */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def replayEnriched(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = Files.createTempDirectory("graft-replay").toString
    // the file stream source wants a directory: watch the testdata dir,
    // filtered down to the events table file
    val raw = s.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
      // integer div: a double round-trip would lose ns precision above 2^53
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EnrichCatalog.enrichedFrame(raw)
      .writeStream.format("parquet")
      .option("path", s"$base/sink")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    s.read.parquet(s"$base/sink").orderBy("event_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_enriched_replay" -> ((s, d) => replayEnriched(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    // identical semantics to the batch path — reuse its oracle verbatim
    "stream_enriched_replay" -> EnrichCatalog.oracleSql("enriched_orders"),
  )
}
