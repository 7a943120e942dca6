package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout writers — the storage-side half of the 100 TB design:
  * what gets pruned at read time is decided at write time.
  *
  *  - [[writePartitionedBy]]: hive-style directory partitioning on a
  *    low-cardinality column; reads with an equality/IN filter prune whole
  *    directories (`PartitionFilters` in the scan, no file listing beyond
  *    the matching partitions).
  *  - [[writeRangeSorted]]: range-repartition + in-file sort on a
  *    high-cardinality column; parquet min/max page/row-group stats then
  *    let range predicates skip most of each file (`PushedFilters`).
  *    This is the poor-man's Z-order for a single dominant predicate
  *    column — composable with directory partitioning for two levels of
  *    pruning.
  *  - [[writeZOrdered]]: bit-interleaved (Morton) clustering on TWO
  *    columns; a range predicate on EITHER (or both) still skips most row
  *    groups, which a single-column sort can only give to its own column.
  */
object Layout {

  def writePartitionedBy(df: DataFrame, dir: String, partitionCol: String): Unit =
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(dir)

  def writeRangeSorted(df: DataFrame, dir: String, sortCol: String,
                       numFiles: Int = 8): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)

  /** Morton (Z-order) key: interleaves the low `bits` bits of two
    * non-negative integer columns (a's bit i lands at position 2i, b's at
    * 2i+1), so sorting by the key clusters BOTH dimensions at once. Built
    * from shift/mask/sum expressions only — whole-stage codegen, no UDF.
    * Inputs must fit in `bits` bits (clamped via mod to stay safe at the
    * boundary); 2·bits ≤ 62 keeps the key in a signed long.
    */
  def zOrderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits in [1,31]: $bits")
    val mask = (1L << bits) - 1
    val ca = pmod(a.cast("long"), lit(mask + 1))
    val cb = pmod(b.cast("long"), lit(mask + 1))
    (0 until bits).map { i =>
      (shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i + 1)): Column
    }.reduce(_ + _)
  }

  /** Z-order clustered write: range-repartition + in-file sort on the
    * Morton key of (colA, colB), then drop the key — the layout is the
    * product, not a schema change. Reads filtering either column's range
    * then skip non-matching row groups via parquet min/max stats, the
    * two-dimensional generalization of [[writeRangeSorted]].
    */
  def writeZOrdered(df: DataFrame, dir: String, colA: Column, colB: Column,
                    bits: Int, numFiles: Int = 8): Unit =
    df.withColumn("__z", zOrderKey(colA, colB, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)

  /** Hive partitioning and Z-order COMPOSED — the full 100 TB scan
    * posture in one layout: directory partitioning on a low-cardinality
    * column prunes whole partitions (statically, or at runtime via a DPP
    * subquery when a dim decides them), and inside each partition
    * directory the files are Morton-clustered on (colA, colB) so range
    * predicates on either column also skip row groups via parquet min/max
    * stats. Range-partitioning the write on (partition, z) keeps each
    * output task on a contiguous z-run of one partition — per-directory
    * files stay z-clustered, not striped.
    */
  def writePartitionedZOrdered(df: DataFrame, dir: String, partitionCol: String,
                               colA: Column, colB: Column, bits: Int,
                               numFiles: Int = 8): Unit =
    df.withColumn("__z", zOrderKey(colA, colB, bits))
      .repartitionByRange(numFiles, col(partitionCol), col("__z"))
      .sortWithinPartitions(partitionCol, "__z")
      .drop("__z")
      .write.partitionBy(partitionCol).mode("overwrite").parquet(dir)

  /** Small-file compaction — the maintenance pass every streaming append
    * sink eventually needs (each micro-batch commits its own files; a
    * 15 s trigger writes ~5 760 files/day/partition). Rewrites `srcDir`
    * into `dstDir` as `numFiles` files, preserving rows exactly: content
    * is read through the normal scan (so schema/pruning metadata survive)
    * and round-robin repartitioned — no sort, no shuffle key, minimum
    * cost. Compact into a NEW directory and swap atomically at the
    * catalog/manifest level; in-place rewrites lose reader isolation.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
              dstDir: String, numFiles: Int): Unit =
    spark.read.parquet(srcDir)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(dstDir)

  /** Bucketed write: hash-partition + sort the frame into `numBuckets`
    * buckets on `bucketCol`, registered as an EXTERNAL session-catalog
    * table (data under `path`) — the co-located-join layout: two tables
    * bucketed the same way join with ZERO input shuffles (`BucketingSpec`
    * asserts the plan). saveAsTable is required because bucket metadata
    * lives in the catalog, not the files.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int = 8): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.write.bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", path).mode("overwrite").saveAsTable(table)
  }
}
