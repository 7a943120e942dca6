package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-maintenance (CDC) operators: MERGE-style upsert, snapshot
  * diffing, and SCD type-2 change-log compression.
  *
  * A 100 TB corpus is never rewritten wholesale — it is maintained: a small
  * ingest batch upserts into a keyed snapshot, audits diff two snapshot
  * versions, and dimension history is kept as compressed validity
  * intervals. These are the relational shapes behind Delta/Iceberg MERGE
  * and CDF, expressed on plain DataFrames so they run on any store.
  *
  * Scale notes:
  *  - `mergeUpsert` never shuffles the snapshot: the change batch is small
  *    by definition (an ingest tick vs the accumulated corpus), so its key
  *    set broadcasts and the snapshot side is a scan + broadcast anti join
  *    + union. At 100 TB this is the only viable shape — a shuffle-side
  *    MERGE would move the whole snapshot.
  *  - `snapshotDiff` is a full outer join on the key — both sides shuffle
  *    once, which is irreducible for an arbitrary-key diff (diffing is the
  *    one maintenance op that genuinely reads both versions).
  *  - `scd2` is one shuffle on the key; the change-detection window and the
  *    validity window share the same partitioning so Catalyst plans a
  *    single exchange.
  */
object Cdc {

  /** MERGE INTO semantics over a keyed snapshot: rows of `changes` whose
    * `isDeleteCol` is true delete the matching snapshot row; other change
    * rows replace their match (or insert when the key is new). `changes`
    * must carry the snapshot schema plus the delete-flag column. Last
    * writer wins is the CALLER's contract: `changes` must have at most one
    * row per key (assert upstream); this op does not re-deduplicate.
    */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame, key: String,
                  isDeleteCol: String = "is_delete"): DataFrame = {
    val touched = broadcast(changes.select(key).distinct())
    snapshot.join(touched, Seq(key), "left_anti")
      .unionByName(changes.filter(!col(isDeleteCol)).drop(isDeleteCol))
  }

  /** Classify every key whose row changed between two snapshot versions:
    * `insert` (key only in `after`), `delete` (key only in `before`),
    * `update` (present in both, any non-key column differs — null-safe
    * struct compare). Unchanged keys are dropped. Returns the key,
    * `change_type`, and `old`/`new` structs of the non-key columns.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: String): DataFrame = {
    val attrs = before.columns.filterNot(_ == key).toSeq
    def packed(df: DataFrame, side: String) = df.select(
      col(key).as(s"__${side}_k"),
      struct(attrs.map(col): _*).as(side))
    packed(before, "old")
      .join(packed(after, "new"), col("__old_k") === col("__new_k"), "full_outer")
      .filter(!(col("old") <=> col("new")))
      .select(
        coalesce(col("__old_k"), col("__new_k")).as(key),
        when(col("__old_k").isNull, lit("insert"))
          .when(col("__new_k").isNull, lit("delete"))
          .otherwise(lit("update")).as("change_type"),
        col("old"), col("new"))
  }

  /** SCD type-2 compression of a change log: keep only the rows where
    * `stateCol` differs from the key's previous row (ordered by `ts`, ties
    * broken by `tieBreak` for a total order), and attach the validity
    * interval — `valid_from` = the change's timestamp, `valid_to` = the
    * next change's (null while current), `is_current`. Both windows
    * partition on `key`, so the plan carries ONE exchange.
    */
  def scd2(log: DataFrame, key: String, ts: String, tieBreak: String,
           stateCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    log.withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(stateCol))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumnRenamed(ts, "valid_from")
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }
}
