package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.engine.Formats

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL round-trips newlines, quotes, and unicode exactly") {
    val tmp = Files.createTempDirectory("graft-jsonl").toString
    val rows = Seq((1L, "line1\nline2"), (2L, "she said \"hi\""),
      (3L, "café — 日本語"))
    val df = rows.toDF("id", "text")
    Formats.writeJsonl(df, s"$tmp/d")
    val back = Formats.readJsonl(spark, s"$tmp/d", df.schema)
      .as[(Long, String)].collect().toSet
    assert(back === rows.toSet)
  }

  test("CSV round-trips commas, quotes, and exact doubles") {
    val tmp = Files.createTempDirectory("graft-csv").toString
    val rows = Seq((1L, "a,b", 0.1), (2L, "say \"hi\"", 1.0 / 3.0),
      (3L, "plain", 1e300))
    val df = rows.toDF("id", "text", "v")
    Formats.writeCsv(df, s"$tmp/d")
    val back = Formats.readCsv(spark, s"$tmp/d", "id LONG, text STRING, v DOUBLE")
      .as[(Long, String, Double)].collect().toSet
    assert(back === rows.toSet)
  }

  test("FAILFAST read raises on malformed input instead of nulling rows") {
    val tmp = Files.createTempDirectory("graft-badjson").toString
    Files.writeString(java.nio.file.Path.of(tmp, "part-0.json"),
      "{\"id\": 1}\nnot json at all\n")
    val schema = StructType.fromDDL("id LONG")
    intercept[org.apache.spark.SparkException] {
      Formats.readJsonl(spark, tmp, schema).collect()
    }
  }

  test("quarantine read splits good rows from captured raw bad lines") {
    val tmp = Files.createTempDirectory("graft-quarantine").toString
    Files.writeString(java.nio.file.Path.of(tmp, "part-0.json"),
      "{\"id\": 1, \"t\": \"a\"}\nnot json at all\n{\"id\": 2, \"t\": \"b\"}\n{\"broken\": \n")
    val schema = StructType.fromDDL("id LONG, t STRING")
    val all = Formats.readJsonlQuarantine(spark, tmp, schema).cache()
    val good = all.filter(col("_quarantined").isNull)
    val bad = all.filter(col("_quarantined").isNotNull)
    assert(good.select("id", "t").as[(Long, String)].collect().toSet
      === Set((1L, "a"), (2L, "b")))
    assert(bad.select("_quarantined").as[String].collect().toSet
      === Set("not json at all", "{\"broken\": "),
      "the raw line is captured verbatim for dead-letter replay")
  }
}
