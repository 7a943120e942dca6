package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Text-format sources (JSONL, CSV) with scale-safe defaults.
  *
  * Parquet is the engine's native layout; these are the interchange
  * formats a pipeline meets at its edges (crawler output, vendor drops,
  * exports). Two rules keep them viable at scale:
  *
  *  - **Schema is always explicit on read.** Inference scans the whole
  *    input once before the real job starts — at 100 TB that doubles the
  *    read. It is also unstable: a batch whose sampled rows miss a field
  *    silently changes the schema downstream.
  *  - **FAILFAST on read.** The default PERMISSIVE mode nulls out
  *    malformed rows; a corrupt shard then surfaces as silently-skewed
  *    aggregates far downstream. Failing the task names the bad file.
  *
  * Both formats stay line-splittable (JSONL by construction; CSV as long
  * as fields contain no raw newlines — quoted embedded newlines force
  * single-file parsing, so normalize them upstream), so reads parallelize
  * per HDFS-block exactly like parquet.
  */
object Formats {

  def writeJsonl(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").json(dir)

  def readJsonl(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(dir)

  /** Quarantine read: PERMISSIVE parse with the corrupt raw line captured
    * in `_quarantined` — the long-job alternative to FAILFAST when a few
    * bad records must not kill a 10-hour ingest. Returns rows where GOOD
    * rows carry null `_quarantined` and parsed fields, and BAD rows carry
    * the raw line with null fields; callers split on `_quarantined IS
    * NULL` and route the quarantine side to a dead-letter sink for
    * replay. The split stays honest because the corrupt column is part of
    * the declared schema (Spark requires the raw line to be selected with
    * the parse, or PERMISSIVE silently drops it).
    */
  def readJsonlQuarantine(spark: SparkSession, dir: String,
                          schema: StructType): DataFrame = {
    import org.apache.spark.sql.types.StringType
    spark.read
      .schema(schema.add("_quarantined", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_quarantined")
      .json(dir)
  }

  /** ORC round-trip: the other columnar interchange format (Hive/Trino
    * ecosystems). Unlike the text formats it keeps column pruning and
    * predicate pushdown (min/max stripe statistics, optional Bloom
    * filters), so an ORC vendor drop scans like parquet — the read below
    * surfaces `PushedFilters` in the plan exactly as the native layout
    * does. Schema stays explicit on read for the same reasons as above
    * (no inference pass, no sampled-schema drift).
    */
  def writeOrc(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").orc(dir)

  def readOrc(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(dir)

  def writeCsv(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)

  def readCsv(spark: SparkSession, dir: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl))
      .option("header", "true").option("mode", "FAILFAST").csv(dir)
}
