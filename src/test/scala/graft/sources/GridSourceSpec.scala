package graft.sources

import graft.{SparkTestBase, XarrayContext}
import graft.grid.{Fixtures, GridResult}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** End-to-end behavior of the grid DSv2 source: pivot correctness, exact
  * partition pruning (reference tests/test_reader.py:948-1271), projection
  * pushdown to storage (:1274-1415), COUNT(*) without data reads
  * (:1395-1415), stats-driven broadcast joins (tests/test_stats.py:94-124).
  */
class GridSourceSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private lazy val ctx = new XarrayContext(spark)

  private def counted[T](body: => T): T = {
    ReadCounters.reset()
    body
  }

  test("pivot: row count = product of dims; cell values match the law") {
    val store = Fixtures.airSmall
    val df = ctx.dataFrame("air_pivot", store, Map("time" -> 6),
      Seq("time", "lat", "lon"))
    val rows = df.collect()
    assert(rows.length == 12 * 11 * 10)
    val law = store.laws("air")
    // spot-check cells incl. first/last and a descending-lat cell
    val byKey = rows.map(r => (r.getTimestamp(0).getTime, r.getDouble(1),
      r.getDouble(2)) -> r.getDouble(3)).toMap
    for (t <- Seq(0, 5, 11); i <- Seq(0, 4, 10); j <- Seq(0, 9)) {
      val key = (Fixtures.hourlyMicros(15706, t, 6) / 1000,
        75.0 - 2.5 * i, 200.0 + 2.5 * j)
      assert(byKey(key) == law(Array(t, i, j)), s"cell ($t,$i,$j)")
    }
  }

  test("laziness: planning and schema access read no variable data") {
    counted {
      val df = ctx.dataFrame("air_lazy", Fixtures.airSmall, Map("time" -> 6),
        Seq("time", "lat", "lon"))
      df.schema // schema access
      df.filter(col("lat") > 60).queryExecution.executedPlan // full planning
      assert(ReadCounters.varReadCount("air") == 0L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
  }

  test("pruning: time predicates open exactly the surviving partitions") {
    val store = Fixtures.pruneGrid // 4 time chunks of 25 days
    val df = ctx.dataFrame("prune1", store, Map("time" -> 25), Seq("time", "lat"))
    // collect, not count(): filtered COUNT(*) is metadata-answered and
    // would open zero partitions — this test pins the SCAN's pruning
    def runCount(d: DataFrame): Long = d.collect().length.toLong

    // time >= day 75 -> only last chunk
    counted {
      assert(runCount(df.filter(col("time") >= to_timestamp(lit("2020-03-16 00:00:00")))) == 25L * 5)
      assert(ReadCounters.partitionsOpened.sum() == 1L)
    }
    // BETWEEN spanning chunks 1..2 -> 2 of 4
    counted {
      assert(runCount(df.filter(col("time").between(
        to_timestamp(lit("2020-02-01 00:00:00")),
        to_timestamp(lit("2020-03-01 00:00:00"))))) == 30L * 5)
      assert(ReadCounters.partitionsOpened.sum() == 2L)
    }
    // impossible filter -> 0 of 4
    counted {
      assert(runCount(df.filter(col("time") < to_timestamp(lit("2019-01-01 00:00:00")))) == 0L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // static-dim (unchunked lat) bounds prune everything too
    counted {
      assert(runCount(df.filter(col("lat") > 100.0)) == 0L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // OR of two time windows -> chunks 0 and 3
    counted {
      assert(runCount(df.filter(
        col("time") < to_timestamp(lit("2020-01-10 00:00:00")) ||
          col("time") > to_timestamp(lit("2020-04-01 00:00:00")))) == (9L + 8L) * 5)
      assert(ReadCounters.partitionsOpened.sum() == 2L)
    }
  }

  test("concat view prunes each member independently") {
    // two t-slabs as separate stores (the open_mfdataset shape), 2
    // chunks each; a predicate inside one slab opens only that slab's
    // surviving chunk — the other member's scan prunes to zero
    val df = ctx.concatDataFrame("concat_prune", Seq(
      (Fixtures.linearGridSlice(0, 12), Map("t" -> 6)),
      (Fixtures.linearGridSlice(12, 24), Map("t" -> 6))),
      Seq("t", "lat", "lon"))
    ReadCounters.reset()
    assert(df.filter(col("t") >= 18).collect().length == 6 * 12 * 10)
    assert(ReadCounters.partitionsOpened.sum() == 1L,
      "boundary filter must open exactly one member chunk")
    ReadCounters.reset()
    assert(df.filter(col("t").between(8, 15)).collect().length == 8 * 12 * 10)
    assert(ReadCounters.partitionsOpened.sum() == 2L,
      "spanning filter opens one chunk per member")
  }

  test("projection pushdown: only requested variables are read") {
    val df = ctx.dataFrame("proj1", Fixtures.twoVarGrid, Map("time" -> 5),
      Seq("time", "lat"))
    counted {
      df.select("time", "temperature").collect()
      assert(ReadCounters.varReadCount("temperature") == 2L) // 2 partitions
      assert(ReadCounters.varReadCount("precipitation") == 0L)
    }
    counted { // dim-only projection reads no variables at all
      df.select("lat").distinct().collect()
      assert(ReadCounters.varReadCount("temperature") == 0L)
      assert(ReadCounters.varReadCount("precipitation") == 0L)
    }
  }

  test("COUNT(*) answers from metadata shape without variable reads") {
    val df = ctx.dataFrame("count1", Fixtures.twoVarGrid, Map("time" -> 5),
      Seq("time", "lat"))
    counted {
      assert(df.count() == 50L)
      assert(ReadCounters.varReadCount("temperature") == 0L)
      assert(ReadCounters.varReadCount("precipitation") == 0L)
      // complete COUNT(*) pushdown: no grid partition is even opened
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // a separable dim filter is exactly pushed, so even the FILTERED
    // count comes from coordinate metadata — zero partitions opened,
    // chunk alignment irrelevant
    counted {
      assert(df.filter(col("lat") > 0.0).count() == 20L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // a data-variable filter stays residual -> the aggregate is NOT
    // pushed and the scan must read (pruning still bounds the work)
    counted {
      assert(df.filter(col("temperature") >= 0.0).count() >= 0L)
      assert(ReadCounters.partitionsOpened.sum() == 2L)
    }
  }

  test("NOT and string-equality dim predicates are exactly pushed") {
    val df = ctx.dataFrame("notpush", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    // != arrives as Not(EqualTo): exact complement on coordinate values,
    // so even the filtered COUNT stays metadata-only
    counted {
      assert(df.filter(col("lat") =!= 0.0).count() == 400L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // NOT BETWEEN arrives as Not(And(>=, <=)): same story
    counted {
      assert(df.filter(!col("time").between(
        to_timestamp(lit("2020-01-11")),
        to_timestamp(lit("2020-01-20")))).count() == 450L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // string dims join the exact-pushdown family for equality shapes
    // (the reference cannot prune strings at all, df.py:447-450); an IN
    // list confined to the first station chunk opens only that chunk
    val st = ctx.dataFrame("stpush", Fixtures.stationGrid,
      Map("station" -> 4), Seq("station", "time"))
    counted {
      val rows = st.filter(col("station").isin("st_1", "st_2")).collect()
      assert(rows.length == 2 * 10)
      assert(rows.forall(r => Set("st_1", "st_2")(r.getString(0))))
      assert(ReadCounters.partitionsOpened.sum() == 1L)
    }
    // ...and a string-equality COUNT(*) is answered from metadata
    counted {
      assert(st.filter(col("station") === "st_5").count() == 10L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // string ORDERING is exact too (UTF-8 binary order == Spark's
    // UTF8_BINARY collation): the COUNT answers from metadata
    counted {
      assert(st.filter(col("station") > "st_5").count() == 20L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // ...and a range collect opens only the chunk holding survivors
    counted {
      val rows = st.filter(col("station") >= "st_6").collect()
      assert(rows.length == 2 * 10)
      assert(rows.forall(r => Set("st_6", "st_7")(r.getString(0))))
      assert(ReadCounters.partitionsOpened.sum() == 1L)
    }
    // LIKE 'p%' prefixes prune exactly (byte-prefix semantics); a
    // prefix matching nothing opens nothing
    counted {
      assert(st.filter(col("station").startsWith("st_")).count() == 80L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
      assert(st.filter(col("station").startsWith("zz")).count() == 0L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
  }

  test("MIN/MAX of dims answer from coordinate metadata, no partitions opened") {
    val df = ctx.dataFrame("metaagg", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    counted {
      val r = df.agg(min("time").as("t0"), max("time").as("t1"),
        min("lat").as("la"), max("lat").as("lb"), count(lit(1)).as("n"))
        .collect()(0)
      assert(r.getTimestamp(0).getTime == 18262L * 86400000L)
      assert(r.getTimestamp(1).getTime == (18262L + 99) * 86400000L)
      assert(r.getDouble(2) == -90.0 && r.getDouble(3) == 90.0)
      assert(r.getLong(4) == 500L)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // aggregating a data VARIABLE cannot be metadata-answered
    counted {
      df.agg(min("temperature")).collect()
      assert(ReadCounters.partitionsOpened.sum() == 4L)
    }
  }

  test("GROUP BY dim: grouped aggregates answer from metadata") {
    val df = ctx.dataFrame("metagrp", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    // density: every lat group spans all 100 days
    counted {
      val rows = df.groupBy("lat")
        .agg(count(lit(1)).as("n"), max("time").as("mx")).collect()
      assert(rows.length == 5)
      rows.foreach { r =>
        assert(r.getLong(1) == 100L)
        assert(r.getTimestamp(2).getTime == (18262L + 99) * 86400000L)
      }
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // separable filter composes: each group counts only surviving days
    counted {
      val rows = df.filter(
        col("time") >= to_timestamp(lit("2020-03-20 00:00:00")))
        .groupBy("lat").agg(count(lit(1)).as("n")).collect()
      assert(rows.length == 5 && rows.forall(_.getLong(1) == 21L))
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // a filter emptying a NON-grouped dim empties the group set too
    counted {
      assert(df.filter(col("time") < to_timestamp(lit("2019-01-01")))
        .groupBy("lat").count().collect().isEmpty)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
    // grouping by a data VARIABLE is never metadata-answered
    counted {
      df.groupBy("temperature").count().collect()
      assert(ReadCounters.partitionsOpened.sum() == 4L)
    }
    // string dims group fine (grouping needs values, not collation)
    val st = ctx.dataFrame("metagrpstr", Fixtures.stationGrid,
      Map("station" -> 4), Seq("station", "time"))
    counted {
      val rows = st.groupBy("station").agg(count(lit(1)).as("n")).collect()
      assert(rows.length == 8 && rows.forall(_.getLong(1) == 10L))
      assert(rows.map(_.getString(0)).toSet ==
        (0 until 8).map(i => s"st_$i").toSet)
      assert(ReadCounters.partitionsOpened.sum() == 0L)
    }
  }

  test("TopN pushdown: ORDER BY dim LIMIT k reads k rows per partition") {
    val df = ctx.dataFrame("topn1", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    val q = df.orderBy(col("time").desc, col("lat"))
      .select("time", "lat", "temperature").limit(3)
    counted {
      val rows = q.collect()
      // top 3 by (time desc, lat asc): the max day with the 3 lowest lats
      assert(rows.map(r => (r.getTimestamp(0).getTime, r.getDouble(1))).toSeq
        == Seq(((18262L + 99) * 86400000L, -90.0),
          ((18262L + 99) * 86400000L, -45.0),
          ((18262L + 99) * 86400000L, 0.0)))
      // every partition emits exactly its local top-3 (4 chunks x 3),
      // not its full 125-row block
      assert(ReadCounters.partitionsOpened.sum() == 4L)
      assert(ReadCounters.rowsEmitted.sum() == 12L,
        s"emitted ${ReadCounters.rowsEmitted.sum()}")
    }
    assert(q.queryExecution.executedPlan.toString.contains("pushedTopN"),
      q.queryExecution.executedPlan.toString)
    // a non-dim sort key is NOT pushed: full blocks are read
    counted {
      df.orderBy(col("temperature").desc).limit(3).collect()
      assert(ReadCounters.rowsEmitted.sum() == 0L) // columnar path = no push
    }
  }

  test("scan emits columnar batches (ColumnarToRow present in plan)") {
    val df = ctx.dataFrame("colbatch", Fixtures.linearGrid, Map("t" -> 6),
      Seq("t", "lat", "lon"))
    // plain projection: bulk columnar path
    val q = df.select("t", "lat", "air")
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      q.queryExecution.executedPlan.toString)
    // a dim filter switches to the enumerating row reader (only matching
    // cells are pivoted; the filter is exact at the scan, no re-filter)
    val f = df.filter(col("lat") > 60.0).select("t", "lat", "air")
    val rows = f.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 60.0))
    val plan = f.queryExecution.executedPlan.toString
    assert(plan.contains("exactDimFilters"), plan)
    assert(!plan.contains("ColumnarToRow"), plan)
  }

  test("tables are re-queryable: fresh scan per query, same results") {
    val ctx2 = new XarrayContext(spark)
    ctx2.fromDataset("requery", Fixtures.linearGrid, Map("t" -> 6))
    val q = "SELECT CAST(SUM(air) AS BIGINT) s FROM requery WHERE t < 12"
    val first = spark.sql(q).collect()(0).getLong(0)
    val second = spark.sql(q).collect()(0).getLong(0)
    assert(first == second)
    // and a different query over the same registration still works
    assert(spark.sql("SELECT COUNT(*) FROM requery").collect()(0).getLong(0)
      == 24L * 12 * 10)
  }

  test("error paths: unknown table and unknown column fail cleanly") {
    val e1 = intercept[Exception](spark.sql("SELECT * FROM no_such_grid").collect())
    assert(e1.getMessage.toLowerCase.contains("table"))
    val ctx2 = new XarrayContext(spark)
    ctx2.fromDataset("errgrid", Fixtures.linearGrid, Map("t" -> 6))
    val e2 = intercept[Exception](
      spark.sql("SELECT nope FROM errgrid").collect())
    assert(e2.getMessage.contains("nope"))
  }

  test("EXPLAIN exposes pruning counts and exact statistics") {
    val df = ctx.dataFrame("explstat", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    val filtered = df.filter(
      col("time") >= to_timestamp(lit("2020-03-16 00:00:00")))
    // the scan description reports surviving/total partitions (the
    // reference pins EXPLAIN statistics the same way, tests/test_stats.py)
    val expl = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(expl.contains("partitions=1/4"), expl)
    // exact post-pruning row count reaches the optimizer's statistics
    val stats = filtered.queryExecution.optimizedPlan.collectLeaves()
      .head.stats
    assert(stats.rowCount.contains(BigInt(125)), stats)
  }

  test("exact statistics drive broadcast-join selection") {
    val big = ctx.dataFrame("stats_big", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    val small = ctx.dataFrame("stats_small", Fixtures.twoVarGrid, Map.empty,
      Seq("time", "lat"))
    val joined = big.join(small.select(col("lat"),
      col("temperature").as("small_temp")), Seq("lat"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    val hasBroadcast = collectWithSubqueries(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty
    assert(hasBroadcast, s"expected broadcast hash join, got:\n$plan")
  }

  test("mixed-dims dataset registers one table per dim group") {
    val views = ctx.fromDataset("era5x", Fixtures.mixedDims,
      Map("time" -> 1))
    assert(views.toSet == Set("era5x_time_lat", "era5x_time_lat_level"))
    assert(spark.table("era5x_time_lat").count() == 2L * 3)
    assert(spark.table("era5x_time_lat_level").count() == 2L * 3 * 2)
    assert(spark.table("era5x_time_lat").columns.toSeq ==
      Seq("time", "lat", "t2m"))
  }

  test("aggregate over chunked grid matches the directly computed value") {
    val store = Fixtures.linearGrid
    val df = ctx.dataFrame("agg1", store, Map("t" -> 6), Seq("t", "lat", "lon"))
    val got = df.groupBy("lat").agg(avg("air").as("a"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (i <- 0 until 12) {
      // mean over t (0..23) and j (0..9) of 200 + t + 2 i + 3 j
      val expected = 200.0 + 23.0 / 2 + 2.0 * i + 3.0 * 4.5
      assert(got(75.0 - 2.5 * i) == expected, s"lat index $i")
    }
  }

  test("TopN composes with exact dim filters: sorted walk over surviving cells") {
    val df = ctx.dataFrame("topnf", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    // lat > 0 keeps 2 of 5 lats (45, 90); top-3 by (time desc, lat asc)
    // over the filtered cells: max day with lat 45 and 90, then day-1
    val q = df.filter(col("lat") > 0.0)
      .orderBy(col("time").desc, col("lat"))
      .select("time", "lat", "temperature").limit(3)
    counted {
      val rows = q.collect()
      assert(rows.map(r => (r.getTimestamp(0).getTime, r.getDouble(1))).toSeq
        == Seq(((18262L + 99) * 86400000L, 45.0),
          ((18262L + 99) * 86400000L, 90.0),
          ((18262L + 98) * 86400000L, 45.0)))
      // each of the 4 partitions emits its local filtered top-3 only
      assert(ReadCounters.rowsEmitted.sum() == 12L,
        s"emitted ${ReadCounters.rowsEmitted.sum()}")
    }
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushedTopN") && plan.contains("exactDimFilters"),
      plan)
  }

  test("runtime filtering: a broadcast join prunes grid chunks at runtime") {
    import graft.SparkTestBase.spark.implicits._
    // pruneGrid: 4 time chunks of 25 days x 5 lats
    val df = ctx.dataFrame("rtf1", Fixtures.pruneGrid, Map("time" -> 25),
      Seq("time", "lat"))
    // two probe days, both inside the LAST chunk (days 80 and 90); the
    // build side carries a selective predicate — DPP only considers
    // filtering joins whose build side filters something — and is built
    // over range() so constant folding can't erase that Filter
    val probe = graft.SparkTestBase.spark.range(0, 2)
      .select(expr("timestamp_seconds((18262 + 80 + id * 10) * 86400)")
        .as("t"))
      .filter(col("t") > to_timestamp(lit("1990-01-01 00:00:00")))
    val joined = df.join(broadcast(probe), col("time") === col("t"))
    counted {
      assert(joined.collect().length == 2 * 5)
      // without runtime filtering all 4 chunks would be read: no static
      // predicate mentions `time`, so only the join's runtime IN-set of
      // probe keys can prune chunks 0-2
      assert(ReadCounters.partitionsOpened.sum() == 1L,
        s"opened ${ReadCounters.partitionsOpened.sum()}\n" +
          joined.queryExecution.executedPlan.toString)
    }
  }

  test("from_map: chunk keys in, queryable rows out (A17 parity)") {
    import graft.SparkTestBase.spark.implicits._
    // generator shaped like the reference's from_map docs: one item per
    // chunk key, each yielding that chunk's rows
    val ds = ctx.fromMap(Seq(0, 1, 2), (k: Int) =>
      (0 until 4).map(i => (k.toLong * 4 + i, s"chunk$k")))
    ds.createOrReplaceTempView("from_map_t")
    assert(ds.rdd.getNumPartitions <= 3 && ds.rdd.getNumPartitions >= 1)
    val got = ctx.sql(
      "SELECT _2 AS c, CAST(COUNT(*) AS BIGINT) n, CAST(SUM(_1) AS BIGINT) s " +
        "FROM from_map_t GROUP BY _2 ORDER BY c").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq(("chunk0", 4L, 6L), ("chunk1", 4L, 22L), ("chunk2", 4L, 38L)))
  }

  test("reverse pivot: SQL result scatters back to a dense grid") {
    val store = Fixtures.linearGrid
    val df = ctx.dataFrame("rev1", store, Map("t" -> 6), Seq("t", "lat", "lon"))
    val res = GridResult.toGrid(
      df.filter(col("t") < 2).select("t", "lat", "lon", "air"),
      Seq("t", "lat", "lon"))
    assert(res.shape == Seq(2, 12, 10))
    val law = store.laws("air")
    assert(res("air", 1, 2, 3) == law(Array(1, 2, 3)))
    // descending lat order preserved (first-appearance = storage order)
    assert(res.dims(1)._2.head == 75.0)
    assert(res.dims(1)._2.last == 75.0 - 2.5 * 11)
  }

  test("reverse pivot: uncovered cells prefill NaN, duplicates reject") {
    val store = Fixtures.linearGrid
    val df = ctx.dataFrame("rev2", store, Map("t" -> 6), Seq("t", "lat", "lon"))
    // drop one cell -> that position must be NaN
    val res = GridResult.toGrid(
      df.filter(col("t") < 2 && !(col("t") === 0 && col("lat") === 75.0 &&
        col("lon") === 200.0)).select("t", "lat", "lon", "air"),
      Seq("t", "lat", "lon"))
    // first-appearance order: the removed cell's lon (200.0) now appears
    // AFTER 202.5 on the lon axis — find the removed cell by value
    val ti = res.dims(0)._2.indexOf(0)
    val li = res.dims(1)._2.indexOf(75.0)
    val oi = res.dims(2)._2.indexOf(200.0)
    assert(res.dims(2)._2.head == 202.5) // 200.0 no longer first
    assert(res("air", ti, li, oi).isNaN)
    assert(!res("air", ti, li, 0).isNaN)
    // collapsing lon away without aggregating -> duplicate cells -> error
    val dup = intercept[IllegalArgumentException] {
      GridResult.toGrid(
        df.filter(col("t") < 2).select("t", "lat", "air"), Seq("t", "lat"))
    }
    assert(dup.getMessage.contains("duplicate cell"))
  }
}
