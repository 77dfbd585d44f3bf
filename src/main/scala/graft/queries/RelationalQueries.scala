package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import scala.collection.immutable.ListMap

/** The relational query surface from SURVEY.md §2B/§2C (items 1-23), each
  * paired with an ANSI-SQL oracle DuckDB runs on the same parquet.
  *
  * Numeric-determinism rules (so results hash-match the oracle bit-for-bit):
  *   - elementwise arithmetic stays in raw doubles — IEEE ops are
  *     correctly-rounded and identical across engines;
  *   - MIN/MAX/COUNT are order-independent — no treatment needed;
  *   - SUM/AVG over doubles go through DECIMAL (exact, order-independent
  *     addition); AVG = CAST(SUM(decimal) AS DOUBLE) / COUNT — a single
  *     deterministic division;
  *   - integer results are always cast to BIGINT on both sides (Spark COUNT
  *     is already long; DuckDB date_part/row_number types differ).
  */
object RelationalQueries {

  /** Exact decimal sum of a 2-decimal money/quantity column, returned as
    * DOUBLE via a string round-trip: decimal->varchar is exact in both
    * engines and string->double parsing is correctly rounded everywhere.
    * Emitting the DECIMAL itself is a trap: the driver reads Spark parquet
    * through pyarrow (scale-padded `Decimal('123.40')`) but the DuckDB
    * oracle through fetchdf (float64, shortest repr `123.4`), so any sum
    * whose last scale digit is 0 hash-mismatches on representation alone.
    */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("string").cast("double")
  /** Deterministic average: exact decimal sum, one double division. */
  private def davg(c: Column, denom: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("string").cast("double") / denom

  type Q = (SparkSession, String) => DataFrame

  val queries: ListMap[String, Q] = ListMap(
    // 1. projection + LIMIT (deterministic via unique sort key)
    "scan_limit" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(10)),

    // 2. SELECT *
    "select_star" -> ((s, d) => Tables.region(s, d)),

    // 3. NDVI-style elementwise column arithmetic (ref 01_ndvi.py:118)
    "proj_arith" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        ((col("l_extendedprice") - col("l_discount")) /
          (col("l_extendedprice") + col("l_discount"))).as("ratio"))),

    // 4. comparison filter
    "filter_cmp" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", "l_quantity")),

    // 5. timestamp BETWEEN (ref README.md:101-102)
    "filter_between_ts" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          to_timestamp(lit("1995-01-01 00:00:00")),
          to_timestamp(lit("1995-12-31 00:00:00"))))
        .select("l_orderkey", "l_linenumber", "l_shipdate")),

    // 6. IN + OR + AND (ref lib.rs:384-423 pruning op list)
    "filter_in_or" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R") &&
          (col("l_quantity") < 3.0 || col("l_quantity") > 48.0))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")),

    // 7. NULL semantics: IS NULL count, null-skipping AVG
    //    (testdata has no nulls; NULLIF synthesizes them deterministically)
    "filter_null" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(nullif(col("l_discount"), lit(0.0)).as("v"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("v")).as("n_nonnull"),
          count(when(col("v").isNull, 1)).as("n_null"),
          (sum(col("v").cast(DecimalType(18, 6))).cast("string").cast("double") /
            count(col("v"))).as("avg_v"))),

    // LIKE / ILIKE-shape pattern filters: leading-wildcard (never
    // index/prune-able), anchored prefix (prune-able at a scan with
    // string zone maps), and an escaped literal % — the pattern trio a
    // SQL surface must get right
    "like_filter" -> ((s, d) =>
      Tables.part(s, d)
        .agg(count(when(col("p_name").like("%green%"), 1)).as("n_contains"),
          count(when(col("p_name").like("alm%"), 1)).as("n_prefix"),
          count(when(lower(col("p_type")).like("%brass"), 1)).as("n_suffix"))),

    // HAVING: post-aggregation predicate on an aggregate expression —
    // planned as Filter ABOVE the aggregate, so map-side partials are
    // unaffected and only qualifying groups survive the final stage
    "having_group" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("string").cast("double").as("total_spend"))
        .filter(col("n_orders") >= 15)),

    // 8. global aggregates
    "agg_global" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("cnt"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"),
        davg(col("l_quantity"), count(lit(1))).as("avg_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))),

    // 9. GROUP BY keys (ref tests/test_sql.py:23-50)
    "agg_group" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"),
          davg(col("l_extendedprice"), count(lit(1))).as("avg_price"))),

    // 9b. ROLLUP subtotals (one Expand + one agg shuffle — grand total
    // and per-flag subtotals in the same pass, no union of rescans;
    // CUBE/GROUPING SETS plan through the identical Expand operator)
    "agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sum_qty"))),

    // 10. GROUP BY expression (ref 02_climatology.py:96-106)
    "agg_group_expr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(month(col("l_shipdate")).cast("long").as("ship_month"))
        .agg(
          count(lit(1)).as("cnt"),
          davg(col("l_quantity"), count(lit(1))).as("avg_qty"))),

    // 11. COUNT(*) (ref tests/test_stats.py:78-91)
    "count_star" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))),

    // 12. DISTINCT + ORDER BY (ref tests/test_sql.py:216-218)
    "distinct_order" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")),

    // 13. ORDER BY DESC + LIMIT = TakeOrderedAndProject
    "orderby_desc_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // 14. multi-table equi-join + agg; small dim broadcast (ref 04_anomaly)
    "join_equi" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("o_totalprice")).as("revenue"))),

    // 15. join on interval expression (ref 05_forecast_skill.py:158-171)
    "join_expr_ts" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy(month(col("o_orderdate")).cast("long").as("order_month"))
        .agg(count(lit(1)).as("cnt"))),

    // 16. range (theta) join against a small bounds table (ref 06_zonal)
    "join_range" -> ((s, d) => {
      val bands = s.createDataFrame(Seq(
        ("b1", 900.0, 924.99), ("b2", 925.0, 949.99),
        ("b3", 950.0, 974.99), ("b4", 975.0, 999.99)))
        .toDF("band", "lo", "hi")
      Tables.part(s, d)
        .join(broadcast(bands),
          col("p_retailprice").between(col("lo"), col("hi")))
        .groupBy("band")
        .agg(count(lit(1)).as("cnt"))
    }),

    // 17. weight-table join + weighted agg (ref 08_regrid_weights.py:195-203)
    //     dyadic weights keep products exact in binary and decimal
    "join_weighted" -> ((s, d) => {
      val weights = s.createDataFrame(Seq(
        ("A", 0.5), ("N", 1.0), ("R", 0.25))).toDF("flag", "wt")
      Tables.lineitem(s, d)
        .join(broadcast(weights), col("l_returnflag") === col("flag"))
        .groupBy("flag")
        .agg(sum((col("l_quantity") * col("wt")).cast(DecimalType(18, 4)))
          .cast("string").cast("double").as("weighted_qty"))
    }),

    // 17b. bucketed co-located join: both sides staged once per JVM as
    //      Spark bucketed tables on the order key (BucketedTables), so
    //      the sort-merge join runs with ZERO Exchange below it — the
    //      join's hash distribution is satisfied by the write-time
    //      bucket layout (pinned in BucketedJoinSpec with broadcast
    //      off). The repeated-join lever at 100 TB: the fact table's
    //      shuffle is paid once at ingest, not per query. Results are
    //      layout-independent, so the oracle is the plain join.
    "join_bucketed" -> ((s, d) => {
      val (ot, lt) = BucketedTables.ordersLineitem(s, d)
      ot.join(lt, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
    }),

    // skew-salted join: the MANUAL skew lever for when AQE's runtime
    // skew split can't help (e.g. the hot key exceeds a single
    // in-memory partition even after splitting, or a deterministic
    // plan is required). The fact side derives a salt from a column
    // it already carries (l_linenumber % 8 — deterministic, no
    // rand()); the other side replicates ×8 against a tiny salt
    // range, so the hot l_orderkey's rows spread over 8 shuffle
    // partitions instead of one straggler. Result ≡ the unsalted
    // join — the oracle is the plain join aggregate.
    "join_skew_salted" -> ((s, d) => {
      val S = 8
      val salts = s.range(S).select(col("id").cast("int").as("salt"))
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          pmod(col("l_linenumber"), lit(S)).cast("int").as("salt"))
      val dim = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .crossJoin(broadcast(salts))
      fact.join(dim,
          fact("l_orderkey") === dim("o_orderkey") &&
            fact("salt") === dim("salt"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("qty"))
    }),

    // 18. CROSS JOIN (ref tests/test_sql.py:126-134)
    "cross_join_count" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .agg(count(lit(1)).as("cnt"))),

    // 19. climatology-CTE anomaly self-join (ref 04_anomaly.py:89-111)
    "cte_selfjoin" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val clim = li.groupBy("l_partkey")
        .agg(davg(col("l_quantity"), count(lit(1))).as("avg_qty"))
      li.join(clim, "l_partkey")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") - col("avg_qty")).as("anomaly"))
    }),

    // 20. composite RMSE aggregate (ref 05:160-163); the square stays a
    //     plain product so both engines produce the identical double. The
    //     big decimal sum converts to double via a STRING round-trip:
    //     decimal->varchar is exact in both engines and string->double
    //     parsing is correctly rounded everywhere, whereas DuckDB's
    //     direct decimal->double cast can be off by 1 ulp at >2^53.
    "rmse_composite" -> ((s, d) => {
      val diff = col("l_extendedprice") - col("p_retailprice") * col("l_quantity")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(sqrt(sum((diff * diff).cast(DecimalType(38, 6)))
          .cast("string").cast("double") /
          count(lit(1))).as("rmse"))
    }),

    // 21. window function: top-3 orders per customer (thesis parity)
    "window_fn" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // 21b. RANGE window frame over event time: trailing-30-day order
    // count and exact spend per customer — the frame is VALUE-bounded
    // (peers enter/leave by timestamp distance, not row position),
    // the window surface ROWS frames cannot express. Epoch-second
    // offsets here = DuckDB's INTERVAL 30 DAY bounds exactly.
    "window_range" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(unix_date(to_date(col("o_orderdate"))).cast("long"))
        .rangeBetween(-30L, 0L) // order dates are midnight: days == exact
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          count(lit(1)).over(w).as("cnt30"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("string").cast("double").as("spend30"))
    }),

    // 13b. LIMIT + OFFSET pagination under a total order
    "limit_offset" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(20).limit(10)),

    // 22. CASE expression (thesis parity, docs/geospatial.md:7)
    "case_expr" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("band"))
        .agg(
          count(lit(1)).as("cnt"),
          davg(col("l_quantity"), count(lit(1))).as("avg_qty"))),

    // 23. registered scalar UDF in a predicate (ref cftime UDF,
    //     tests/test_sql.py:303-314); oracle expresses it as arithmetic
    "udf_scalar" -> ((s, d) => {
      s.udf.register("epoch_day",
        (t: java.sql.Timestamp) => t.getTime / 86400000L)
      Tables.lineitem(s, d)
        .filter(call_udf("epoch_day", col("l_shipdate")) >= 9496L)
        .agg(
          count(lit(1)).as("cnt"),
          min("l_shipdate").as("min_ship"),
          max("l_shipdate").as("max_ship"))
    }),

    // set operation (not exercised by the reference — "free from Spark",
    // SURVEY §2B — demonstrated for completeness)
    "union_all" -> ((s, d) =>
      Tables.region(s, d).select(col("r_name").as("name"))
        .unionAll(Tables.nation(s, d).select(col("n_name").as("name")))),

    // semi/anti joins (EXISTS / NOT EXISTS shapes)
    "exists_semi_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select("o_custkey")
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"),
        "left_semi").agg(count(lit(1)).as("n"))
        .select(lit("with_orders").as("grp"), col("n"))
      val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"),
        "left_anti").agg(count(lit(1)).as("n"))
        .select(lit("without_orders").as("grp"), col("n"))
      withOrders.unionAll(withoutOrders)
    }),

    // BIG x BIG range join (no broadcastable side at scale): urgent
    // orders open a 1-day shipping window; every lineitem shipped
    // inside a window pairs with that order. Planned naively this is a
    // broadcast-nested-loop / cartesian; RangeJoinOps.binnedRangeJoin
    // rewrites it to a hash join on 2-day epoch-day bins + residual
    // re-check, so both sides shuffle ONCE and the pair space is never
    // enumerated beyond true matches. Because the final grouping
    // (ship month) is functionally determined by the point value (ship
    // day), the COUNT is pushed BELOW the join: points pre-aggregate
    // to (day, n) — ~2.4k rows however big lineitem is — the range
    // join runs on the aggregate, and pair counts come from summing
    // n per matched interval (14M logical pairs at sf0.1, never
    // materialized).
    "join_range_binned" -> ((s, d) => {
      val pts = Tables.lineitem(s, d)
        .groupBy(unix_date(to_date(col("l_shipdate"))).cast("long")
          .as("ship_day"),
          date_trunc("month", col("l_shipdate")).as("ship_month"))
        .agg(count(lit(1)).as("n"))
      val iv = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(unix_date(to_date(col("o_orderdate"))).cast("long").as("lo"))
        .withColumn("hi", col("lo") + 1L)
      graft.operators.RangeJoinOps
        .binnedRangeJoin(pts, "ship_day", iv, "lo", "hi", 2L)
        .groupBy(col("ship_month"))
        .agg(sum(col("n")).as("n_pairs"))
    }),

    // full outer join: two PARTIAL per-customer aggregates (high-value
    // orders vs latest-year orders) merged with COALESCE — each side has
    // customers the other lacks, so every outer branch is exercised. The
    // using-column join coalesces the key; at scale this is a plain
    // shuffle hash join on o_custkey, no broadcast needed either way.
    "join_outer" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val hi = o.filter(col("o_totalprice") > 400000.0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_hi"))
      val recent = o
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n_recent"))
      hi.join(recent, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          coalesce(col("n_hi"), lit(0L)).as("n_hi"),
          coalesce(col("n_recent"), lit(0L)).as("n_recent"))
    }),

    // INTERSECT / EXCEPT (distinct set semantics, like SQL): nations
    // with customers vs nations with suppliers. Both rewrite to
    // aggregates + joins under the hood, so they inherit the shuffle
    // machinery (and AQE) of groupBy/join.
    "set_intersect_except" -> ((s, d) => {
      val cn = Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nationkey"))
      val sn = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("long").as("nationkey"))
      cn.intersect(sn).select(lit("both").as("tag"), col("nationkey"))
        .unionAll(cn.except(sn)
          .select(lit("customer_only").as("tag"), col("nationkey")))
    }),

    // BAG-semantics set ops (INTERSECT ALL / EXCEPT ALL): duplicates
    // survive by multiplicity — min(countA, countB) and
    // countA - countB respectively — a different operator from the
    // DISTINCT forms above (Spark plans them as a count-compare
    // aggregate, not a dedup). Output is the grouped histogram of
    // each result so the gate stays bounded.
    "set_ops_all" -> ((s, d) => {
      val cn = Tables.customer(s, d)
        .select(col("c_nationkey").cast("long").as("nationkey"))
      val sn = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("long").as("nationkey"))
      cn.intersectAll(sn)
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("tag"), col("nationkey"), col("n"))
        .unionAll(cn.exceptAll(sn)
          .groupBy("nationkey").agg(count(lit(1)).as("n"))
          .select(lit("except_all").as("tag"), col("nationkey"), col("n")))
    }),

    // semi-structured surface: JSON path extraction over an embedded
    // JSON column (documents carry none, so the doc metadata is
    // serialized to JSON first — the round trip IS the test: build,
    // extract by path, type back). Both engines parse the identical
    // string, so the gate is engine-neutral; numeric fields re-cast
    // to BIGINT to avoid JSON number-representation skew.
    "json_extract" -> ((s, d) => {
      val js = concat(lit("{\"lang\":\""), col("lang"),
        lit("\",\"source\":\""), col("source"),
        lit("\",\"n\":"), col("n_chars"), lit("}"))
      Tables.documents(s, d)
        .select(col("doc_id"), js.as("js"))
        .select(col("doc_id"),
          get_json_object(col("js"), "$.lang").as("lang"),
          get_json_object(col("js"), "$.source").as("source"),
          get_json_object(col("js"), "$.n").cast("long").as("n_chars"))
        .filter(col("lang") === "en")
    }),

    // ordered string aggregation (Spark 4's LISTAGG ... WITHIN GROUP):
    // per region, the ordered comma-joined nation list. The WITHIN
    // GROUP ordering on a UNIQUE key makes the concatenation
    // deterministic at any parallelism — an unordered listagg would
    // concatenate in partition-arrival order and never hash-match
    // (or reproduce). Scale shape: one groupBy, list state bounded by
    // group cardinality (25 nations).
    "string_agg_group" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("nation_sa")
      s.sql("""SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
              |listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
              |  AS nations
              |FROM nation_sa GROUP BY n_regionkey""".stripMargin)
    }),

    // exact DISTINCT aggregate
    "count_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_returnflag"), col("l_linestatus"))
          .as("n_flag_status"))),

    // 24. parameterized SQL (ref 02_climatology.py:96-114 param_values)
    "param_query" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_pq")
      s.sql(
        "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt " +
          "FROM lineitem_pq WHERE l_quantity > :minq GROUP BY l_returnflag",
        Map("minq" -> 40))
    }),

    // PIVOT to wide: per-source doc counts, one column per language.
    // The value list is FIXED — no value-discovery pre-job, so the plan
    // is one aggregate (Spark pivots via a single Aggregate with
    // pivot-filtered partials, scale-safe); absent combos coalesce to 0
    // to match the CASE-counting oracle.
    "pivot_wide" -> ((s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val wide = Tables.documents(s, d)
        .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
      wide.select(col("source") +:
        langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
    }),

    // schema evolution at union time: an old batch without `source`
    // unions a new batch that has it (unionByName +
    // allowMissingColumns -> nulls) — the ingestion-over-time shape
    "union_evolve" -> ((s, d) => {
      val v1 = Tables.documents(s, d).filter(col("doc_id") < 250)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val v2 = Tables.documents(s, d).filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          count(col("source")).as("n_with_source"))
    }),

    // UNPIVOT back to long (Spark's unpivot = the Expand operator —
    // melt without a join or a shuffle beyond the final ordering)
    "unpivot_long" -> ((s, d) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val wide = Tables.documents(s, d)
        .groupBy("source").pivot("lang", langs).agg(count(lit(1)))
        .select(col("source") +:
          langs.map(l => coalesce(col(l), lit(0L)).as(l)): _*)
      wide.unpivot(Array(col("source")), langs.map(col).toArray,
        "lang", "n_docs")
        .filter(col("n_docs") > 0)
    }),

    // GROUPING SETS with non-hierarchical sets ((flag), (status), ()) —
    // a shape neither ROLLUP nor CUBE expresses; still ONE Expand +
    // one agg shuffle, no union of rescans
    "agg_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |CAST(count(*) AS BIGINT) AS cnt,
              |CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS STRING)
              |  AS DOUBLE) AS sum_qty
              |FROM lineitem_gs
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
              |""".stripMargin)
    }),

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE): a generated month
    // spine LEFT JOINs the fact table, so empty months would surface —
    // the calendar-spine shape; recursion is pure sequence generation
    // (12 iterations, no data-dependent bound), everything after it a
    // plain broadcast join + agg
    "cte_recursive" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_rc")
      s.sql("""WITH RECURSIVE m(n) AS (
              |  SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12)
              |SELECT CAST(n AS BIGINT) AS ship_month,
              |CAST(COUNT(l_orderkey) AS BIGINT) AS cnt
              |FROM m LEFT JOIN lineitem_rc ON month(l_shipdate) = n
              |GROUP BY n""".stripMargin)
    }),

    // lateral explode (generator / UNNEST): one row per split token —
    // a map-side generator, zero shuffles; the row-multiplying verb
    // under every token-level pipeline stage
    "lateral_explode" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          explode(split(col("o_orderpriority"), "-")).as("tok")))
  )

  private val davgSql =
    (c: String, denom: String) =>
      s"CAST(CAST(SUM(CAST($c AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)/$denom"
  private val dsumSql =
    (c: String) =>
      s"CAST(CAST(SUM(CAST($c AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)"

  val oracleSql: ListMap[String, String] = ListMap(
    "scan_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "select_star" -> "SELECT * FROM region",
    "proj_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |(l_extendedprice - l_discount)/(l_extendedprice + l_discount) AS ratio
        |FROM lineitem""".stripMargin,
    "filter_cmp" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45.0""".stripMargin,
    "filter_between_ts" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |AND TIMESTAMP '1995-12-31 00:00:00'""".stripMargin,
    "filter_in_or" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem WHERE l_returnflag IN ('A','R')
        |AND (l_quantity < 3.0 OR l_quantity > 48.0)""".stripMargin,
    "filter_null" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |CAST(COUNT(v) AS BIGINT) AS n_nonnull,
        |CAST(COUNT(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_null,
        |CAST(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)/COUNT(v)
        |  AS avg_v
        |FROM (SELECT NULLIF(l_discount, 0.0) AS v FROM lineitem) t""".stripMargin,
    "like_filter" ->
      """SELECT
        |CAST(COUNT(*) FILTER (WHERE p_name LIKE '%green%') AS BIGINT)
        |  AS n_contains,
        |CAST(COUNT(*) FILTER (WHERE p_name LIKE 'alm%') AS BIGINT)
        |  AS n_prefix,
        |CAST(COUNT(*) FILTER (WHERE lower(p_type) LIKE '%brass') AS BIGINT)
        |  AS n_suffix
        |FROM part""".stripMargin,
    "having_group" ->
      """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
        |  AS DOUBLE) AS total_spend
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) >= 15""".stripMargin,
    "agg_global" ->
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
         |MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         |${davgSql("l_quantity", "COUNT(*)")} AS avg_qty,
         |${dsumSql("l_extendedprice")} AS sum_price
         |FROM lineitem""".stripMargin,
    "agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(COUNT(*) AS BIGINT) AS cnt,
         |${dsumSql("l_quantity")} AS sum_qty,
         |${davgSql("l_extendedprice", "COUNT(*)")} AS avg_price
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "agg_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(COUNT(*) AS BIGINT) AS cnt,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "agg_group_expr" ->
      s"""SELECT CAST(date_part('month', l_shipdate) AS BIGINT) AS ship_month,
         |CAST(COUNT(*) AS BIGINT) AS cnt,
         |${davgSql("l_quantity", "COUNT(*)")} AS avg_qty
         |FROM lineitem GROUP BY 1""".stripMargin,
    "count_star" -> "SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM lineitem",
    "distinct_order" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "orderby_desc_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "join_equi" ->
      s"""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt,
         |${dsumSql("o_totalprice")} AS revenue
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,
    "join_expr_ts" ->
      """SELECT CAST(date_part('month', o_orderdate) AS BIGINT) AS order_month,
        |CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1""".stripMargin,
    "join_range" ->
      """SELECT band, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM part JOIN (VALUES ('b1',900.0,924.99),('b2',925.0,949.99),
        |('b3',950.0,974.99),('b4',975.0,999.99)) AS b(band,lo,hi)
        |ON p_retailprice BETWEEN lo AND hi
        |GROUP BY band""".stripMargin,
    "join_weighted" ->
      """SELECT flag,
        |CAST(CAST(SUM(CAST(l_quantity * wt AS DECIMAL(18,4))) AS VARCHAR)
        |  AS DOUBLE) AS weighted_qty
        |FROM lineitem JOIN (VALUES ('A',0.5),('N',1.0),('R',0.25))
        |  AS w(flag,wt) ON l_returnflag = flag
        |GROUP BY flag""".stripMargin,
    "join_bucketed" ->
      s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt,
         |${dsumSql("l_quantity")} AS qty
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY o_orderstatus""".stripMargin,
    // salting is result-invariant: the oracle is the plain join
    "join_skew_salted" ->
      s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt,
         |${dsumSql("l_quantity")} AS qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin,
    "cross_join_count" ->
      "SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM region CROSS JOIN nation",
    "cte_selfjoin" ->
      s"""WITH clim AS (
         |  SELECT l_partkey, ${davgSql("l_quantity", "COUNT(*)")} AS avg_qty
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT l.l_orderkey, l.l_linenumber,
         |l.l_quantity - c.avg_qty AS anomaly
         |FROM lineitem l JOIN clim c ON l.l_partkey = c.l_partkey""".stripMargin,
    "rmse_composite" ->
      """SELECT SQRT(CAST(CAST(SUM(CAST(
        |  (l_extendedprice - p_retailprice*l_quantity) *
        |  (l_extendedprice - p_retailprice*l_quantity) AS DECIMAL(38,6)))
        |  AS VARCHAR) AS DOUBLE)/COUNT(*)) AS rmse
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "window_fn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "window_range" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(COUNT(*) OVER w AS BIGINT) AS cnt30,
        |CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
        |  AS VARCHAR) AS DOUBLE) AS spend30
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)""".stripMargin,
    "limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 10 OFFSET 20""".stripMargin,
    "case_expr" ->
      s"""SELECT CASE WHEN l_quantity < 10 THEN 'low'
         |WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS band,
         |CAST(COUNT(*) AS BIGINT) AS cnt,
         |${davgSql("l_quantity", "COUNT(*)")} AS avg_qty
         |FROM lineitem GROUP BY 1""".stripMargin,
    "udf_scalar" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        |FROM lineitem
        |WHERE date_diff('day', TIMESTAMP '1970-01-01', l_shipdate) >= 9496""".stripMargin,
    "param_query" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem WHERE l_quantity > 40 GROUP BY l_returnflag""".stripMargin,
    "pivot_wide" ->
      """SELECT source,
        |CAST(COUNT(*) FILTER (WHERE lang = 'de') AS BIGINT) AS n_de,
        |CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
        |CAST(COUNT(*) FILTER (WHERE lang = 'es') AS BIGINT) AS n_es,
        |CAST(COUNT(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS n_fr,
        |CAST(COUNT(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS n_zh
        |FROM documents GROUP BY source""".stripMargin,
    "union_evolve" ->
      """WITH u AS (
        |  SELECT doc_id, lang, n_chars, NULL AS source FROM documents
        |  WHERE doc_id < 250
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars, source FROM documents
        |  WHERE doc_id >= 250)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
        |CAST(COUNT(source) AS BIGINT) AS n_with_source
        |FROM u GROUP BY lang""".stripMargin,
    "unpivot_long" ->
      """SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY source, lang""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |CAST(COUNT(*) AS BIGINT) AS cnt,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,
    "cte_recursive" ->
      """WITH RECURSIVE m(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 12)
        |SELECT CAST(n AS BIGINT) AS ship_month,
        |CAST(COUNT(l_orderkey) AS BIGINT) AS cnt
        |FROM m LEFT JOIN lineitem
        |  ON date_part('month', l_shipdate) = n
        |GROUP BY n""".stripMargin,
    "lateral_explode" ->
      """SELECT o_orderkey,
        |unnest(string_split(o_orderpriority, '-')) AS tok
        |FROM orders""".stripMargin,
    "union_all" ->
      """SELECT r_name AS name FROM region
        |UNION ALL SELECT n_name AS name FROM nation""".stripMargin,
    "exists_semi_anti" ->
      """SELECT 'with_orders' AS grp, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'without_orders' AS grp, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "join_range_binned" ->
      """SELECT date_trunc('month', l.l_shipdate) AS ship_month,
        |  CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM lineitem l JOIN orders o
        |  ON o.o_orderpriority = '1-URGENT'
        | AND l.l_shipdate BETWEEN o.o_orderdate
        |                      AND o.o_orderdate + INTERVAL 1 DAY
        |GROUP BY 1""".stripMargin,
    "join_outer" ->
      """WITH hi AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_hi FROM orders
        |  WHERE o_totalprice > 400000 GROUP BY 1),
        |rec AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_recent FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY 1)
        |SELECT COALESCE(hi.o_custkey, rec.o_custkey) AS o_custkey,
        |  COALESCE(n_hi, 0) AS n_hi, COALESCE(n_recent, 0) AS n_recent
        |FROM hi FULL OUTER JOIN rec ON hi.o_custkey = rec.o_custkey""".stripMargin,
    "set_intersect_except" ->
      """WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey
        |  FROM customer),
        |sn AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey
        |  FROM supplier)
        |SELECT 'both' AS tag, nationkey
        |  FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT 'customer_only' AS tag, nationkey
        |  FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)""".stripMargin,
    "set_ops_all" ->
      """WITH cn AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey
        |  FROM customer),
        |sn AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey
        |  FROM supplier)
        |SELECT 'intersect_all' AS tag, nationkey,
        |CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT nationkey FROM cn
        |      INTERSECT ALL SELECT nationkey FROM sn) GROUP BY nationkey
        |UNION ALL
        |SELECT 'except_all' AS tag, nationkey, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (SELECT nationkey FROM cn
        |      EXCEPT ALL SELECT nationkey FROM sn) GROUP BY nationkey""".stripMargin,
    // the same JSON string built and path-extracted on both engines
    "json_extract" ->
      """WITH j AS (
        |  SELECT doc_id,
        |  '{"lang":"' || lang || '","source":"' || source ||
        |    '","n":' || n_chars || '}' AS js
        |  FROM documents)
        |SELECT doc_id,
        |json_extract_string(js, '$.lang') AS lang,
        |json_extract_string(js, '$.source') AS source,
        |CAST(json_extract_string(js, '$.n') AS BIGINT) AS n_chars
        |FROM j WHERE json_extract_string(js, '$.lang') = 'en'""".stripMargin,
    // the WITHIN GROUP ordering on the unique name makes the
    // concatenation engine-independent
    "string_agg_group" ->
      """SELECT CAST(n_regionkey AS BIGINT) AS regionkey,
        |string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin,
    "count_distinct" ->
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |CAST(COUNT(DISTINCT (l_returnflag, l_linestatus)) AS BIGINT)
        |  AS n_flag_status
        |FROM lineitem""".stripMargin
  )
}
