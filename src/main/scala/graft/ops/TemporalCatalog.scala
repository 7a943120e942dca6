package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Tables}

/** Driver-contract registrations for the temporal-join tier over `events`:
  * purchase→view as-of attribution and click→error range correlation.
  *
  * The DuckDB oracles are dialect-original — native `ASOF LEFT JOIN` for
  * the attribution (an entirely independent implementation of the
  * semantics: DuckDB's is a sorted merge, ours is a union-tag window) and a
  * plain inequality join for the range query (the engine's bucketed
  * equi-join must be invisible in the result).
  */
object TemporalCatalog extends Catalog {

  val RangeWindowSec: Long = 4 * 3600L

  /** merge_asof-parity tolerance for the directional variants (seconds). */
  val AsofToleranceSec: Long = 2 * 3600L

  /** Both sides truncate to whole seconds before differencing (Spark
    * `unix_timestamp`), so the gap is identical across the µs (Spark) and
    * ns (DuckDB) readings of events.parquet.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_purchase_attribution" -> ((s, d) => {
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
      Temporal.asofJoin(purchases, views, "user_id", "ts", "ts",
          payload = Seq("event_id", "ts"), tieBreak = "event_id", prefix = "view_")
        .select(col("event_id"), col("user_id"),
          Relational.tsStr(col("ts")).as("ts"), col("value"),
          col("view_event_id"),
          Relational.tsStr(col("view_ts")).as("view_ts"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("view_ts"))).as("gap_sec"))
        .orderBy("event_id")
    }),

    // forward as-of with tolerance (pandas merge_asof direction='forward'):
    // each view's NEXT click by the same user, null beyond 2 h
    "asof_next_click" -> ((s, d) => {
      val ev = Tables(s, d).events
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
      Temporal.asofJoin(views, clicks, "user_id", "ts", "ts",
          payload = Seq("event_id", "ts"), tieBreak = "event_id",
          prefix = "click_", direction = "forward",
          toleranceSec = Some(AsofToleranceSec))
        .select(col("event_id"), col("user_id"),
          Relational.tsStr(col("ts")).as("ts"),
          col("click_event_id"),
          Relational.tsStr(col("click_ts")).as("click_ts"),
          (unix_timestamp(col("click_ts")) - unix_timestamp(col("ts"))).as("gap_sec"))
        .orderBy("event_id")
    }),

    // nearest as-of with tolerance (pandas merge_asof direction='nearest'):
    // the view closest in time to each purchase, either side, within 2 h;
    // equidistant candidates prefer the earlier (backward) one
    "asof_nearest_view" -> ((s, d) => {
      val ev = Tables(s, d).events
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
      Temporal.asofJoin(purchases, views, "user_id", "ts", "ts",
          payload = Seq("event_id", "ts"), tieBreak = "event_id",
          prefix = "view_", direction = "nearest",
          toleranceSec = Some(AsofToleranceSec))
        .select(col("event_id"), col("user_id"),
          Relational.tsStr(col("ts")).as("ts"), col("value"),
          col("view_event_id"),
          Relational.tsStr(col("view_ts")).as("view_ts"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("view_ts"))).as("gap_sec"))
        .orderBy("event_id")
    }),

    "range_click_errors" -> ((s, d) => {
      val ev = Tables(s, d).events
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      Temporal.rangeJoin(clicks, errors, "user_id", "ts", "ts",
          RangeWindowSec, prefix = "err_")
        .select(col("event_id"), col("user_id"),
          Relational.tsStr(col("ts")).as("ts"),
          col("err_event_id"),
          Relational.tsStr(col("err_ts")).as("err_ts"),
          col("err_value"))
        .orderBy("event_id", "err_event_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "asof_purchase_attribution" ->
      """SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts, p.value,
        |  v.event_id AS view_event_id,
        |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
        |  CAST(epoch(date_trunc('second', p.ts))
        |     - epoch(date_trunc('second', v.ts)) AS BIGINT) AS gap_sec
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts > v.ts
        |ORDER BY p.event_id""".stripMargin,

    // forward variant via LEFT JOIN LATERAL — an independent nested-loop
    // formulation DuckDB decorrelates itself. Comparisons run on
    // epoch_us() so the oracle sees the same µs instants Spark reads
    // (events.parquet is ns; Spark truncates to µs at load).
    "asof_next_click" ->
      s"""SELECT v.event_id, v.user_id,
         |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS ts,
         |  c.event_id AS click_event_id,
         |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
         |  CAST(epoch(date_trunc('second', c.ts))
         |     - epoch(date_trunc('second', v.ts)) AS BIGINT) AS gap_sec
         |FROM (SELECT * FROM events WHERE event_type = 'view') v
         |LEFT JOIN LATERAL (
         |  SELECT event_id, ts FROM events c
         |  WHERE c.event_type = 'click' AND c.user_id = v.user_id
         |    AND epoch_us(c.ts) > epoch_us(v.ts)
         |    AND epoch_us(c.ts) - epoch_us(v.ts) <= ${AsofToleranceSec * 1000000L}
         |  ORDER BY epoch_us(c.ts) ASC, c.event_id ASC
         |  LIMIT 1
         |) c ON TRUE
         |ORDER BY v.event_id""".stripMargin,

    // nearest variant: minimal |gap|, equidistant prefers backward, ties
    // within a side resolve greatest-id backward / smallest-id forward
    // (mirroring the engine's per-direction tie-break)
    "asof_nearest_view" ->
      s"""SELECT p.event_id, p.user_id,
         |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts, p.value,
         |  v.event_id AS view_event_id,
         |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
         |  CAST(epoch(date_trunc('second', p.ts))
         |     - epoch(date_trunc('second', v.ts)) AS BIGINT) AS gap_sec
         |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         |LEFT JOIN LATERAL (
         |  SELECT event_id, ts FROM events v
         |  WHERE v.event_type = 'view' AND v.user_id = p.user_id
         |    AND epoch_us(v.ts) <> epoch_us(p.ts)
         |    AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= ${AsofToleranceSec * 1000000L}
         |  ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC,
         |           (epoch_us(v.ts) < epoch_us(p.ts)) DESC,
         |           CASE WHEN epoch_us(v.ts) < epoch_us(p.ts)
         |                THEN -event_id ELSE event_id END ASC
         |  LIMIT 1
         |) v ON TRUE
         |ORDER BY p.event_id""".stripMargin,

    "range_click_errors" ->
      s"""SELECT c.event_id, c.user_id,
         |  strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
         |  e.event_id AS err_event_id,
         |  strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS err_ts,
         |  e.value AS err_value
         |FROM (SELECT * FROM events WHERE event_type = 'click') c
         |JOIN (SELECT * FROM events WHERE event_type = 'error') e
         |  ON c.user_id = e.user_id
         | AND e.ts > c.ts AND e.ts <= c.ts + INTERVAL $RangeWindowSec SECOND
         |ORDER BY c.event_id, e.event_id""".stripMargin,
  )
}
