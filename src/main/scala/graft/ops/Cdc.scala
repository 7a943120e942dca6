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

  /** Upsert-if-newer: a change row replaces its snapshot match only when
    * it is strictly newer by the (`ts`, `tieBreak`) total order (new keys
    * always insert). This is the idempotent, order-tolerant MERGE an
    * at-least-once ingest needs: replayed or out-of-order batches
    * converge to the same snapshot — the per-key (ts, tieBreak) maximum —
    * regardless of batch boundaries. `changes` must be pre-deduplicated
    * to one row per key.
    *
    * The snapshot is never shuffled: the touched keys broadcast INTO a
    * semi join to look up the incumbents (output ≤ one row per change
    * key), losers are filtered with that small frame broadcast back, and
    * survivors anti-join out of the snapshot. The only exchange in the
    * plan is the change batch's own dedup.
    */
  def mergeNewest(snapshot: DataFrame, changes: DataFrame, key: String,
                  ts: String, tieBreak: String): DataFrame = {
    val winners = newestWinners(snapshot, changes, key, ts, tieBreak)
    snapshot.join(broadcast(winners.select(key)), Seq(key), "left_anti")
      .unionByName(winners)
  }

  /** The subset of `changes` [[mergeNewest]] would apply: rows strictly
    * newer than their incumbent by (`ts`, `tieBreak`), plus new keys.
    * Exposed so a change-data-feed writer can derive the version's change
    * set from the SAME frame the merge applies — O(|changes|) rows, never
    * a snapshot diff.
    */
  def newestWinners(snapshot: DataFrame, changes: DataFrame, key: String,
                    ts: String, tieBreak: String): DataFrame = {
    val incumbents = snapshot
      .join(broadcast(changes.select(key).distinct()), Seq(key), "left_semi")
      .select(col(key), col(ts).as("__inc_ts"), col(tieBreak).as("__inc_tb"))
    changes
      .join(broadcast(incumbents), Seq(key), "left_outer")
      .filter(col("__inc_ts").isNull ||
        struct(col(ts), col(tieBreak)) > struct(col("__inc_ts"), col("__inc_tb")))
      .drop("__inc_ts", "__inc_tb")
  }

  /** The change set a [[mergeNewest]] application emits — the Delta/Iceberg
    * change-data-feed row shape `(key, change_type, old, new)` derived from
    * the winners frame instead of diffing snapshot versions: `old` is the
    * replaced incumbent row (null on insert), `new` the winning row.
    * Equals [[snapshotDiff]](prev, mergeNewest(prev, changes, ...)) for an
    * upsert-only pipeline (no deletes; a winner is always strictly newer in
    * `ts`/`tieBreak`, so no winner can tie its incumbent) — proven in
    * `CdcSpec` — but costs one broadcast semi-join into the snapshot scan
    * where snapshotDiff full-outer-joins two whole versions: at 100 TB the
    * diff-per-batch would shuffle the snapshot twice per micro-batch, this
    * shuffles nothing.
    */
  def mergeChangeSet(prev: DataFrame, winners: DataFrame, key: String): DataFrame = {
    val attrs = winners.columns.filterNot(_ == key).toSeq
    val newSide = winners.select(col(key), struct(attrs.map(col): _*).as("new"))
    val oldSide = prev
      .join(broadcast(winners.select(key).distinct()), Seq(key), "left_semi")
      .select(col(key), struct(attrs.map(col): _*).as("old"))
    newSide.join(broadcast(oldSide), Seq(key), "left_outer")
      .select(col(key),
        when(col("old").isNull, lit("insert")).otherwise(lit("update"))
          .as("change_type"),
        col("old"), col("new"))
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
