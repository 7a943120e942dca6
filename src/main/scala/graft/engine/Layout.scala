package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

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
  */
object Layout {

  def writePartitionedBy(df: DataFrame, dir: String, partitionCol: String): Unit =
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(dir)

  def writeRangeSorted(df: DataFrame, dir: String, sortCol: String,
                       numFiles: Int = 8): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)
}
