package graft.sources

import graft.{SparkTestBase, XarrayContext}
import graft.grid.Fixtures

/** 2-level namespace parity (reference sql.py:105-125 `era5.surface`,
  * listing parity tests/test_sql.py:445-449): per-dataset DSv2 catalog,
  * dim-group tables, SHOW TABLES, and read-only enforcement.
  */
class GridCatalogSpec extends SparkTestBase {

  test("2-level names: one table per dim group, queryable + listable") {
    val ctx = new XarrayContext(spark)
    val names = ctx.fromDatasetCatalog("era5", Fixtures.mixedDims,
      Map("time" -> 1))
    assert(names.toSet == Set("era5.time_lat", "era5.time_lat_level"))

    // qualified SELECTs resolve through the catalog
    assert(spark.sql("SELECT time, lat, t2m FROM era5.time_lat")
      .count() == 2L * 3)
    assert(spark.sql(
      "SELECT time, lat, level, pressure FROM era5.time_lat_level")
      .count() == 2L * 3 * 2)
    // catalog listing parity: SHOW TABLES IN era5
    val listed = spark.sql("SHOW TABLES IN era5")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(listed == Set("time_lat", "time_lat_level"))
    // pushdown still works through the catalog path: pruning on time
    ReadCounters.reset()
    val n = spark.sql("SELECT t2m FROM era5.time_lat WHERE time >= " +
      "timestamp'2020-01-02 00:00:00'").collect().length
    assert(n == 3)
    assert(ReadCounters.partitionsOpened.sum() == 1L) // 1 of 2 time chunks
  }

  test("catalog is read-only and rejects unknown tables") {
    val ctx = new XarrayContext(spark)
    ctx.fromDatasetCatalog("era5ro", Fixtures.mixedDims, Map("time" -> 1))
    intercept[Exception](spark.sql("DROP TABLE era5ro.time_lat"))
    intercept[Exception](spark.sql("SELECT * FROM era5ro.nope").collect())
  }
}
