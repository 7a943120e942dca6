package graft

import org.apache.spark.sql.Row

import graft.engine.Tables
import graft.shopping.Views

class ViewsSpec extends SparkSpec {
  lazy val t: Tables = Tables(spark, sf)

  test("agePreferences: one row per bucket, counts sum to base") {
    val rows = Views.agePreferences(t).collect()
    val buckets = rows.map(_.getString(0))
    assert(buckets.distinct.length === buckets.length)
    assert(rows.map(_.getLong(1)).sum === Views.base(t).count())
    assert(rows.forall(r => !r.isNullAt(4)), "every bucket has a top category")
  }

  test("genderPreferences: 5 market segments") {
    val rows = Views.genderPreferences(t).collect()
    assert(rows.length === 5)
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
  }

  test("locationPreferences: top_categories has <= 3 entries, ordered by count desc") {
    val rows = Views.locationPreferences(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cats = r.getSeq[String](3)
      assert(cats.nonEmpty && cats.length <= 3)
      assert(cats.distinct.length === cats.length)
    }
  }

  test("ageGenderCategory: grouped counts sum to base count") {
    val rows = Views.ageGenderCategory(t).collect()
    assert(rows.map(_.getLong(3)).sum === Views.base(t).count())
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but should be rare; views must be oracled
    assert(!missing.exists(_.startsWith("v_")))
  }
}
