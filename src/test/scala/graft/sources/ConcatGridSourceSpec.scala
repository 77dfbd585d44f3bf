package graft.sources

import graft.{SparkTestBase, XarrayContext}
import graft.grid.Fixtures
import org.apache.spark.sql.functions._

/** SQL-level multi-store concat: one catalog table over a fleet of
  * stores, with per-member pruning and metadata-aggregate partials.
  */
class ConcatGridSourceSpec extends SparkTestBase {

  private def registerFleet(cat: String): String =
    new XarrayContext(spark).concatCatalogTable(cat, "concat_view",
      Seq(
        (Fixtures.linearGridSlice(0, 12), Map("t" -> 6)),
        (Fixtures.linearGridSlice(12, 24), Map("t" -> 6))),
      Seq("t", "lat", "lon"))

  test("concat catalog table unions members and lists in SHOW TABLES") {
    val q = registerFleet("ccspec1")
    val n = spark.sql(s"SELECT count(*) AS n FROM $q").collect().head.getLong(0)
    assert(n == 24L * 12 * 10)
    val tables = spark.sql("SHOW TABLES IN ccspec1").collect()
      .map(_.getString(1))
    assert(tables.contains("concat_view"))
    // values match the single-store grid on a boundary-straddling slice
    val got = spark.sql(
      s"""SELECT sum(air) AS s FROM $q WHERE t BETWEEN 8 AND 15""")
      .collect().head.getDouble(0)
    val expect = (for (t <- 8 to 15; i <- 0 until 12; j <- 0 until 10)
      yield 200.0 + t + 2.0 * i + 3.0 * j).sum
    assert(got == expect)
  }

  test("per-member pruning: a t predicate opens only matching members' chunks") {
    val q = registerFleet("ccspec2")
    ReadCounters.reset()
    // t >= 18: member 1 (t 0-11, chunks {0-5, 6-11}) contributes ZERO
    // partitions; member 2 (t 12-23) prunes to its second chunk only
    val rows = spark.sql(
      s"SELECT sum(air) AS s, count(*) AS n FROM $q WHERE t >= 18")
      .collect()
    assert(ReadCounters.partitionsOpened.sum() == 1L)
    assert(rows.head.getLong(1) == 6L * 12 * 10)
  }

  test("metadata aggregates survive concat as per-member partials") {
    val q = registerFleet("ccspec3")
    ReadCounters.reset()
    val r = spark.sql(
      s"SELECT count(*) AS n, min(t) AS lo, max(t) AS hi FROM $q")
      .collect().head
    // each member answers from coordinate metadata; ZERO chunk opens
    assert(ReadCounters.partitionsOpened.sum() == 0L)
    assert(r.getLong(0) == 24L * 12 * 10)
    assert(r.getInt(1) == 0 && r.getInt(2) == 23)
  }

  test("members must agree on relational shape") {
    intercept[IllegalArgumentException] {
      new ConcatGridTable("bad", Seq(
        (Fixtures.linearGrid, Map("t" -> 6)),
        (Fixtures.maskGrid, Map.empty)), Seq("t", "lat", "lon")).schema()
    }
  }

  test("concat table works with the DataFrame API too") {
    val q = registerFleet("ccspec4")
    val df = spark.table(q).filter(col("lat") > 70.0)
      .groupBy("t").agg(count(lit(1)).as("n"))
    assert(df.count() == 24L)
    assert(df.filter(col("n") =!= 20L).count() == 0L) // 2 lats x 10 lons
  }
}
