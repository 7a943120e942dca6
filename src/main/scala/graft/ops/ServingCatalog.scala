package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Tables}
import graft.shopping.{Enrich, EnrichCatalog}

/** Driver-contract registrations for the serving-edge ops (SURVEY §2.3):
  * top-N fetch, filter shapes, distinct values, display projection — each
  * over driver testdata with a DuckDB oracle.
  */
object ServingCatalog extends Catalog {

  /** The planted malformed lines for the quarantine fixture (declared so
    * the oracle can name their raw-line hashes; no single quotes — they
    * embed in the oracle SQL verbatim).
    */
  val BadJsonLines = Seq(
    """{"doc_id": 9000001, "lang": }""",
    """not json at all""",
    """{"truncated": """)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ORDER BY processed_time DESC LIMIT n (streamlit_app.py:188-189)
    "latest_events" -> ((s, d) =>
      Serving.topN(Tables(s, d).events,
          Seq(col("ts").desc, col("event_id").desc), 100)
        .select(col("event_id"), Relational.tsStr(col("ts")).as("ts"),
          col("user_id"), col("event_type"), col("value"))),

    "distinct_event_types" -> ((s, d) =>
      Serving.distinctValues(Tables(s, d).events, "event_type")),

    // VIP & Premium conjunctive filter + metric tiles (streamlit_app.py:685-698)
    "vip_premium_metrics" -> ((s, d) => {
      val e = Enrich.enrich(Tables(s, d).events, processedTime = col("ts"))
      Serving.whereAll(e, Seq(
          col("customer_segment") === "VIP",
          col("amount_category") === "Premium"))
        .agg(
          count(lit(1)).as("n_orders"),
          Relational.moneySum(col("value")).as("raw_revenue"),
          sum(col("final_amount_usd").cast("decimal(18,4)")).cast("double").as("final_revenue"),
          Relational.moneyAvg(col("value")).as("avg_order"),
          // CLV carries 2 decimals; the decimal round-trip makes the mean
          // summation-order independent (same trick as moneyAvg)
          round(sum(col("estimated_clv").cast("decimal(20,4)")).cast("double")
            / count(lit(1)), 4).as("avg_clv"))
    }),

    // per-user sessionization (north-star §7.5): same session_window the
    // stream uses, run in batch, oracled via gaps-and-islands SQL
    "user_sessions" -> ((s, d) =>
      graft.streaming.Streams.userSessions(Tables(s, d).events, "30 minutes")
        .select(col("user_id"), Relational.tsStr(col("session_start")).as("session_start"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start")),

    // ordered view→click→purchase conversion funnel over the same sessions
    // (north-star §7.5): stage shares per session, ordering enforced by
    // running within-session windows
    "session_funnel" -> ((s, d) =>
      Sessions.sessionFunnel(Tables(s, d).events, "30 minutes")),

    // daily cohort-retention triangle (first-activity cohorts × offset)
    "cohort_retention" -> ((s, d) =>
      Sessions.cohortRetention(Tables(s, d).events, unit = "day")
        .orderBy("cohort", "offset")),

    // first-order Markov transition matrix between consecutive event
    // types in each user's event order, with per-source probabilities
    "event_transitions" -> ((s, d) =>
      Sessions.transitions(Tables(s, d).events)
        .orderBy("prev_type", "event_type")),

    // time-to-convert distribution: per user, microseconds from the FIRST
    // view to the first purchase at-or-after it; the duration population
    // goes through the distributed nearest-rank selection
    // (exactQuantilesGlobal — no global sort at any user cardinality).
    // Durations are exact integer microseconds on both engines
    // (unix_micros / epoch_us), so the quantiles hash-match bit-for-bit.
    "time_to_purchase" -> ((s, d) => {
      val e = Tables(s, d).events
      val firstView = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
      val firstPurchase = e.filter(col("event_type") === "purchase")
        .join(firstView, Seq("user_id"))
        .filter(col("ts") >= col("first_view"))
        .groupBy(col("user_id"), col("first_view"))
        .agg(min(col("ts")).as("first_purchase"))
      val durations = firstPurchase.select(
        (unix_micros(col("first_purchase")) - unix_micros(col("first_view")))
          .as("dur_us"))
      Relational.exactQuantilesGlobal(durations, col("dur_us"),
        Seq(250, 500, 750, 900))
    }),

    // write-time layout → read-time pruning, inside the gate: partition the
    // events table by type, read back through a partition filter (scans
    // only the matching directory), verify the rows against the flat oracle.
    // The layout is written ONCE per (JVM, sfDir) — it is the fixture under
    // test, not part of the query; re-writing it per run would charge write
    // cost to every bench repetition of a read-side pruning proof
    "partitioned_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("part", d)(tmp =>
        graft.engine.Layout.writePartitionedBy(Tables(s, d).events, tmp, "event_type"))
      s.read.parquet(dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), Relational.tsStr(col("ts")).as("ts"),
          col("user_id"), col("value"))
        .orderBy("event_id")
    }),

    // DYNAMIC partition pruning: the pruning predicate is NOT statically
    // known — "days on which a high-value error occurred" exists only at
    // runtime — so the partitioned fact scan is pruned by a
    // dynamicpruning subquery fed from the broadcast dim at execution
    // time (LayoutSpec asserts the plan; the dim needs a SELECTIVE FILTER
    // for the PartitionPruning rule to fire — an aggregate or limit alone
    // does not qualify). This is THE fact×dim mechanism at 100 TB: the
    // dim decides which partition directories of the fact ever get
    // listed. Same once-per-JVM fixture treatment as partitioned_scan.
    "dpp_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("part-day", d)(tmp =>
        graft.engine.Layout.writePartitionedBy(
          Tables(s, d).events.withColumn("event_day", to_date(col("ts"))),
          tmp, "event_day"))
      val errorDays = Tables(s, d).events
        .filter(col("event_type") === "error" && col("value") > 200)
        .select(to_date(col("ts")).as("event_day")).distinct()
      s.read.parquet(dir)
        .join(broadcast(errorDays), Seq("event_day"))
        .groupBy(col("event_day"))
        .agg(count(lit(1)).as("n_events"),
          Relational.moneySum(col("value")).as("total_value"))
        .select(date_format(col("event_day"), "yyyy-MM-dd").as("event_day"),
          col("n_events"), col("total_value"))
        .orderBy("event_day")
    }),

    // the other half of the write-time-layout story: range-repartition +
    // in-file sort on a high-cardinality column, read back through a range
    // predicate — parquet min/max stats skip the non-matching row groups
    // (LayoutSpec asserts the PushedFilters); same once-per-JVM fixture
    // treatment as partitioned_scan
    "range_pruned_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("range", d)(tmp =>
        graft.engine.Layout.writeRangeSorted(
          Tables(s, d).events.select("event_id", "user_id", "event_type", "value"),
          tmp, "value"))
      s.read.parquet(dir)
        .filter(col("value") >= 450.0)
        .select(col("event_id"), col("value"))
        .orderBy("event_id")
    }),

    // two-dimensional layout pruning: Z-order (Morton) clustering on
    // (user_id, floor(value)) — a conjunctive range filter on BOTH natural
    // columns reads back only the row groups whose min/max overlap the
    // query box; same once-per-JVM fixture treatment, same flat oracle
    // (the layout must be invisible to results)
    "zorder_pruned_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("zorder", d)(tmp =>
        graft.engine.Layout.writeZOrdered(
          Tables(s, d).events.select("event_id", "user_id", "event_type", "value"),
          tmp, col("user_id"), floor(col("value")), bits = 11))
      s.read.parquet(dir)
        .filter(col("user_id").between(100L, 199L) && col("value").between(100.0, 200.0))
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id")
    }),

    // the COMPOSED layout proof (round-5 stretch): hive partitioning by
    // day + per-day Z-order on (user_id, floor(value)), read through a
    // runtime dim join AND a conjunctive range box — one plan in which
    // the DPP subquery prunes partition directories and the pushed range
    // filters skip row groups inside the survivors (LayoutSpec asserts
    // both prunings on this exact shape). Flat oracle: layout invisible.
    "zorder_dpp_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("zorder-day", d)(tmp =>
        graft.engine.Layout.writePartitionedZOrdered(
          Tables(s, d).events
            .withColumn("event_day", to_date(col("ts")))
            .select("event_id", "user_id", "event_type", "value", "event_day"),
          tmp, "event_day", col("user_id"), floor(col("value")), bits = 11))
      val errorDays = Tables(s, d).events
        .filter(col("event_type") === "error" && col("value") > 200)
        .select(to_date(col("ts")).as("event_day")).distinct()
      s.read.parquet(dir)
        .filter(col("user_id").between(100L, 199L) &&
          col("value").between(100.0, 200.0))
        .join(broadcast(errorDays), Seq("event_day"))
        .select(date_format(col("event_day"), "yyyy-MM-dd").as("event_day"),
          col("event_id"), col("user_id"), col("value"))
        .orderBy("event_id")
    }),

    // small-file compaction through the gate: a 64-file "streaming sink"
    // layout compacted to 4 files must read back row-identical (the flat
    // oracle) — the maintenance op is invisible to query results
    "compacted_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("compact", d) { tmp =>
        Tables(s, d).events.repartition(64)
          .write.mode("overwrite").parquet(s"$tmp/small")
        graft.engine.Layout.compact(s, s"$tmp/small", s"$tmp/compacted", 4)
      }
      s.read.parquet(s"$dir/compacted")
        .select(col("event_id"), Relational.tsStr(col("ts")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }),

    // JSONL source parity: documents written as JSON lines and read back
    // through the schema-explicit FAILFAST source must equal the parquet
    // truth (text content proven by hash — JSON escaping round-trips
    // newlines and unicode exactly)
    "jsonl_source_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("jsonl", d) { tmp =>
        graft.engine.Formats.writeJsonl(Tables(s, d).documents, s"$tmp/docs")
      }
      graft.engine.Formats.readJsonl(s, s"$dir/docs", Tables(s, d).documents.schema)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("text_md5"))
        .orderBy("doc_id")
    }),

    // quarantine ingest: the same JSONL corpus with three malformed lines
    // planted in a sibling shard — PERMISSIVE + corrupt-record capture
    // routes bad lines to a quarantine column instead of killing the job
    // (the FAILFAST default is right for curated batch inputs; a 10-hour
    // ingest of third-party data needs the dead-letter path). Good rows
    // prove content by text hash, quarantined rows by RAW-LINE hash.
    "jsonl_quarantine_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("jsonl-quarantine", d) { tmp =>
        graft.engine.Formats.writeJsonl(Tables(s, d).documents, s"$tmp/docs")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(tmp, "docs", "bad.json"),
          BadJsonLines.mkString("\n"))
      }
      graft.engine.Formats.readJsonlQuarantine(s, s"$dir/docs",
          Tables(s, d).documents.schema)
        .select(col("doc_id"), col("lang"),
          when(col("_quarantined").isNull, md5(col("text")))
            .otherwise(md5(col("_quarantined"))).as("content_md5"),
          col("_quarantined").isNotNull.as("quarantined"))
        .orderBy(col("quarantined"), col("doc_id"), col("content_md5"))
    }),

    // CSV source parity: events exported with headers and read back with
    // an explicit DDL schema — doubles round-trip exactly (Java
    // Double.toString is parse-exact), timestamps travel as strings
    "csv_source_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("csv", d) { tmp =>
        graft.engine.Formats.writeCsv(
          Tables(s, d).events.select(col("event_id"),
            Relational.tsStr(col("ts")).as("ts"), col("user_id"),
            col("event_type"), col("value")),
          s"$tmp/events")
      }
      graft.engine.Formats.readCsv(s, s"$dir/events",
          "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE")
        .orderBy("event_id")
    }),

    // ORC source parity: the columnar interchange format round-trips with
    // full type fidelity (no string staging like CSV), and the filtered
    // read keeps predicate pushdown — plan-asserted in PlanAuditSpec
    "orc_source_scan" -> ((s, d) => {
      val dir = graft.engine.FixtureDirs("orc", d) { tmp =>
        graft.engine.Formats.writeOrc(
          Tables(s, d).events.select(col("event_id"), col("ts"),
            col("user_id"), col("event_type"), col("value")),
          s"$tmp/events")
      }
      graft.engine.Formats.readOrc(s, s"$dir/events",
          org.apache.spark.sql.types.StructType.fromDDL(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"))
        .filter(col("value") > 50)
        .select(col("event_id"), Relational.tsStr(col("ts")).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("event_id")
    }),

    // IN-list + boolean + display projection page (streamlit_app.py:998-1011)
    "filtered_display" -> ((s, d) =>
      Serving.displayPage(
        Serving.whereIn(Tables(s, d).events, "event_type", Seq("purchase", "view"))
          .filter(col("value") > 50)
          .withColumn("ts", Relational.tsStr(col("ts"))),
        wanted = Seq("event_id", "ts", "event_type", "value", "no_such_column"),
        order = Seq(col("event_id").desc), limit = 200)),
  )

  def oracleSql: Map[String, String] = Map(
    "latest_events" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id,
        |       event_type, value
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 100""".stripMargin,

    "distinct_event_types" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "vip_premium_metrics" ->
      s"""WITH e AS (${EnrichCatalog.enrichedSql})
         |SELECT count(*) AS n_orders,
         |       ${Catalog.moneySumSql("value")} AS raw_revenue,
         |       CAST(sum(fin) AS DOUBLE) AS final_revenue,
         |       ${Catalog.moneyAvgSql("value")} AS avg_order,
         |       round(CAST(sum(fin * CAST(${Enrich.ClvFactor} AS DECIMAL(2,0))) AS DOUBLE) / count(*), 4) AS avg_clv
         |FROM e
         |WHERE user_id % 10 = 0 AND value >= ${Enrich.PremiumMin}""".stripMargin,

    // same tie-block nearest-rank arithmetic as global_price_quantiles,
    // over exact integer microsecond durations
    "time_to_purchase" ->
      """WITH fv AS (SELECT user_id, min(ts) AS first_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |fp AS (SELECT e.user_id, fv.first_view, min(e.ts) AS first_purchase
        |  FROM events e JOIN fv USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
        |  GROUP BY e.user_id, fv.first_view),
        |b AS (SELECT CAST(epoch_us(first_purchase) - epoch_us(first_view) AS BIGINT) AS v,
        |    count(*) AS cnt
        |  FROM fp GROUP BY 1),
        |r AS (SELECT v, cnt,
        |    coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnt_less,
        |    sum(cnt) OVER () AS n
        |  FROM b)
        |SELECT CAST(max(n) AS BIGINT) AS n,
        |  max(CASE WHEN cnt_less * 1000 < n * 250
        |    AND n * 250 <= (cnt_less + cnt) * 1000 THEN v END) AS p250,
        |  max(CASE WHEN cnt_less * 1000 < n * 500
        |    AND n * 500 <= (cnt_less + cnt) * 1000 THEN v END) AS p500,
        |  max(CASE WHEN cnt_less * 1000 < n * 750
        |    AND n * 750 <= (cnt_less + cnt) * 1000 THEN v END) AS p750,
        |  max(CASE WHEN cnt_less * 1000 < n * 900
        |    AND n * 900 <= (cnt_less + cnt) * 1000 THEN v END) AS p900
        |FROM r""".stripMargin,

    "user_sessions" ->
      s"""WITH o AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
         |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |s AS (SELECT user_id, ts, value,
         |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM o)
         |SELECT user_id,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  count(*) AS n_events,
         |  ${Catalog.moneySumSql("value")} AS session_value
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    "event_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev_type,
        |         event_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type, count(*) AS n
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, event_type, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
        |FROM c ORDER BY prev_type, event_type""".stripMargin,

    // same gaps-and-islands sessionization as user_sessions, then the
    // ordered funnel: a click counts only after a view in-session, a
    // purchase only after such a click (strictly earlier rows, hence the
    // "1 PRECEDING" frames)
    "session_funnel" ->
      """WITH o AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |f AS (
        |  SELECT *,
        |    event_type = 'click' AND count(*) FILTER (WHERE event_type = 'view')
        |      OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0 AS click_ok
        |  FROM s),
        |g AS (
        |  SELECT *,
        |    event_type = 'purchase' AND count(*) FILTER (WHERE click_ok)
        |      OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) > 0 AS purchase_ok
        |  FROM f),
        |sess AS (
        |  SELECT user_id, sid,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
        |    max(CASE WHEN click_ok THEN 1 ELSE 0 END) AS has_click,
        |    max(CASE WHEN purchase_ok THEN 1 ELSE 0 END) AS has_purchase
        |  FROM g GROUP BY user_id, sid)
        |SELECT CASE WHEN has_purchase = 1 THEN '3_converted'
        |            WHEN has_click = 1 THEN '2_clicked'
        |            WHEN has_view = 1 THEN '1_viewed'
        |            ELSE '0_no_view' END AS funnel_stage,
        |  count(*) AS n_sessions,
        |  round(CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (), 4) AS pct_sessions
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,

    "cohort_retention" ->
      """WITH f AS (SELECT user_id, date_trunc('day', min(ts)) AS cohort
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS period
        |  FROM events),
        |m AS (SELECT f.cohort,
        |    CAST(date_diff('day', f.cohort, a.period) AS BIGINT) AS "offset",
        |    count(DISTINCT a.user_id) AS n_active
        |  FROM a JOIN f USING (user_id)
        |  GROUP BY 1, 2),
        |s AS (SELECT cohort, n_active AS cohort_size FROM m
        |  WHERE "offset" = 0)
        |SELECT strftime(m.cohort, '%Y-%m-%d %H:%M:%S') AS cohort,
        |  m."offset" AS "offset",
        |  CAST(m.n_active AS BIGINT) AS n_active,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
        |  CAST(m.n_active AS DOUBLE) / s.cohort_size AS retention
        |FROM m JOIN s USING (cohort)
        |ORDER BY cohort, "offset"""".stripMargin,

    "partitioned_scan" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id, value
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,

    "dpp_scan" ->
      s"""WITH ed AS (
         |  SELECT DISTINCT CAST(ts AS DATE) AS event_day FROM events
         |  WHERE event_type = 'error' AND value > 200),
         |byday AS (
         |  SELECT CAST(ts AS DATE) AS event_day, count(*) AS n_events,
         |    ${graft.engine.Catalog.moneySumSql("value")} AS total_value
         |  FROM events GROUP BY 1)
         |SELECT strftime(event_day, '%Y-%m-%d') AS event_day, n_events, total_value
         |FROM byday JOIN ed USING (event_day)
         |ORDER BY event_day""".stripMargin,

    "range_pruned_scan" ->
      """SELECT event_id, value
        |FROM events WHERE value >= 450.0
        |ORDER BY event_id""".stripMargin,

    "zorder_pruned_scan" ->
      """SELECT event_id, user_id, value
        |FROM events
        |WHERE user_id BETWEEN 100 AND 199 AND value BETWEEN 100.0 AND 200.0
        |ORDER BY event_id""".stripMargin,

    "zorder_dpp_scan" ->
      """WITH ed AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS event_day FROM events
        |  WHERE event_type = 'error' AND value > 200)
        |SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS event_day,
        |  e.event_id, e.user_id, e.value
        |FROM events e JOIN ed ON CAST(e.ts AS DATE) = ed.event_day
        |WHERE e.user_id BETWEEN 100 AND 199
        |  AND e.value BETWEEN 100.0 AND 200.0
        |ORDER BY e.event_id""".stripMargin,

    "compacted_scan" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "jsonl_source_scan" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "jsonl_quarantine_scan" -> {
      val badValues = BadJsonLines.map(l => s"('$l')").mkString(", ")
      s"""SELECT doc_id, lang, md5(text) AS content_md5, false AS quarantined
         |FROM documents
         |UNION ALL
         |SELECT NULL, NULL, md5(line), true
         |FROM (VALUES $badValues) t(line)
         |ORDER BY quarantined, doc_id, content_md5""".stripMargin
    },

    "csv_source_scan" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "orc_source_scan" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id,
        |  event_type, value
        |FROM events WHERE value > 50 ORDER BY event_id""".stripMargin,

    "filtered_display" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type, value
        |FROM events
        |WHERE event_type IN ('purchase', 'view') AND value > 50
        |ORDER BY event_id DESC LIMIT 200""".stripMargin,
  )
}
