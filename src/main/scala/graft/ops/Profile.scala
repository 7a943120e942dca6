package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType, TimestampNTZType, TimestampType}

/** Data-quality profiling and constraint checking — the governance pass a
  * pipeline runs before a table ships (the Deequ/Great-Expectations
  * surface, expressed as plain aggregates).
  *
  * Scale shape: [[profile]] is ONE aggregate job over the table — every
  * per-column statistic is a column of the same grouped aggregate, so the
  * table is scanned once no matter how many columns are profiled (the
  * exact distinct counts expand the aggregate, still one pass per scan).
  * [[runChecks]] unions independent violation counts; each check is its
  * own aggregate subtree, filters push into its scan, and a check that
  * needs a join (referential integrity) broadcasts the dimension side.
  */
object Profile {

  /** Per-column profile rows:
    * `(column, n, n_null, n_distinct, min_num, max_num, min_len, max_len,
    * min_ts, max_ts)` — numeric bounds for numeric columns, length bounds
    * for strings, formatted bounds for timestamps (doubles never leave the
    * engine as strings: engines format them differently).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def aggsFor(c: String): Seq[Column] = {
      val base = Seq(
        count(lit(1)).as(s"__${c}_n"),
        (count(lit(1)) - count(col(c))).as(s"__${c}_nulls"),
        count_distinct(col(c)).as(s"__${c}_distinct"))
      types(c) match {
        case _: NumericType => base ++ Seq(
          min(col(c)).cast("double").as(s"__${c}_min_num"),
          max(col(c)).cast("double").as(s"__${c}_max_num"))
        case StringType => base ++ Seq(
          min(length(col(c))).cast("long").as(s"__${c}_min_len"),
          max(length(col(c))).cast("long").as(s"__${c}_max_len"))
        case TimestampType | TimestampNTZType => base ++ Seq(
          Relational.tsStr(min(col(c))).as(s"__${c}_min_ts"),
          Relational.tsStr(max(col(c))).as(s"__${c}_max_ts"))
        case other => sys.error(s"unsupported profile type for $c: $other")
      }
    }
    val aggs = cols.flatMap(aggsFor)
    val one = df.agg(aggs.head, aggs.tail: _*)
    def out(c: String, suffix: String, tpe: String): Column =
      if (one.columns.contains(s"__${c}_$suffix")) col(s"__${c}_$suffix")
      else lit(null).cast(tpe)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__${c}_n").as("n"),
        col(s"__${c}_nulls").as("n_null"),
        col(s"__${c}_distinct").as("n_distinct"),
        out(c, "min_num", "double").as("min_num"),
        out(c, "max_num", "double").as("max_num"),
        out(c, "min_len", "long").as("min_len"),
        out(c, "max_len", "long").as("max_len"),
        out(c, "min_ts", "string").as("min_ts"),
        out(c, "max_ts", "string").as("max_ts"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Run named constraint checks: each entry is a frame of VIOLATING rows
    * (empty = pass). Returns `(check_name, violations, passed)`, one row
    * per check, computed as a union of count aggregates.
    */
  def runChecks(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, violations) =>
      violations.agg(count(lit(1)).cast("long").as("violations"))
        .select(lit(name).as("check_name"), col("violations"),
          (col("violations") === 0L).as("passed"))
    }.reduce(_ unionByName _)
}
