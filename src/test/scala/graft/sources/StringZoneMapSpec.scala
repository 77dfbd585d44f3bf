package graft.sources

import graft.{SparkTestBase, XarrayContext}
import graft.grid._
import org.apache.spark.sql.functions._

/** String-dimension pruning semantics: UTF-8 binary order (the order
  * Spark's default UTF8_BINARY collation compares in), zone-map bounds,
  * prefix regions, TopN permutations and metadata MIN/MAX. The reference
  * cannot prune string dims at all (df.py:447-450); exactness here rides
  * on Utf8Order reproducing `UTF8String.binaryCompare` bit-for-bit —
  * including outside the BMP, where `String.compareTo` (UTF-16 units)
  * disagrees.
  */
class StringZoneMapSpec extends SparkTestBase {

  private lazy val ctx = new XarrayContext(spark)

  test("Utf8Order matches UTF8String.binaryCompare, incl. non-BMP") {
    import org.apache.spark.unsafe.types.UTF8String
    // "�" (replacement) vs "😀" (U+1F600): UTF-16 unit
    // order puts the surrogate pair FIRST, UTF-8 byte order LAST —
    // the exact disagreement that used to keep string ordering residual
    val tricky = Seq("", "a", "ab", "b", "st_5", "st_50", "zz",
      "�", "😀", "é", "é", "￿")
    for (a <- tricky; b <- tricky) {
      val expect = Integer.signum(
        UTF8String.fromString(a).binaryCompare(UTF8String.fromString(b)))
      assert(Integer.signum(Utf8Order.compare(a, b)) == expect,
        s"compare($a, $b)")
      assert(Utf8Order.startsWith(a, b) ==
        UTF8String.fromString(a).startsWith(UTF8String.fromString(b)),
        s"startsWith($a, $b)")
    }
    // String.compareTo really does disagree on the tricky pair — the
    // reason Utf8Order exists at all
    assert("😀".compareTo("�") < 0 &&
      Utf8Order.compare("😀", "�") > 0)
  }

  test("prefixSuccessor bounds every prefixed string, drops 0xFF tails") {
    // succ(p) must be > every string starting with p and <= any string
    // at/after the prefix region
    for (p <- Seq("a", "st_", "abÿ", "é")) {
      val succ = Utf8Order.prefixSuccessor(p)
      assert(succ.isDefined, s"succ($p)")
      for (tail <- Seq("", "a", "zzz", "￿")) {
        assert(Utf8Order.compareRaw(succ.get, p + tail) > 0,
          s"succ($p) vs $p$tail")
      }
    }
    assert(Utf8Order.prefixSuccessor("").isEmpty)
  }

  test("StrBounds zone maps: ranges, IN, prefixes exclude and include") {
    import org.apache.spark.sql.sources._
    val b = Map[String, DimBounds]("s" -> StrBounds("st_2", "st_5"))
    // range excludes
    assert(ZoneMapPruning.excludes(GreaterThan("s", "st_5"), b))
    assert(!ZoneMapPruning.excludes(GreaterThanOrEqual("s", "st_5"), b))
    assert(ZoneMapPruning.excludes(LessThan("s", "st_2"), b))
    assert(ZoneMapPruning.excludes(EqualTo("s", "st_6"), b))
    assert(!ZoneMapPruning.excludes(EqualTo("s", "st_3"), b))
    assert(ZoneMapPruning.excludes(In("s", Array("st_0", "st_9")), b))
    // prefix excludes: region before, region after, and a hit
    assert(ZoneMapPruning.excludes(StringStartsWith("s", "st_6"), b))
    assert(ZoneMapPruning.excludes(StringStartsWith("s", "a"), b))
    assert(!ZoneMapPruning.excludes(StringStartsWith("s", "st_3"), b))
    assert(!ZoneMapPruning.excludes(StringStartsWith("s", ""), b))
    // includes: the whole bound range inside the predicate region
    assert(ZoneMapPruning.includes(GreaterThanOrEqual("s", "st_2"), b))
    assert(!ZoneMapPruning.includes(GreaterThan("s", "st_2"), b))
    assert(ZoneMapPruning.includes(LessThanOrEqual("s", "st_5"), b))
    assert(ZoneMapPruning.includes(StringStartsWith("s", "st_"), b))
    assert(!ZoneMapPruning.includes(StringStartsWith("s", "st_2"), b))
    val one = Map[String, DimBounds]("s" -> StrBounds("st_3", "st_3"))
    assert(ZoneMapPruning.includes(StringStartsWith("s", "st_3"), one))
    assert(ZoneMapPruning.includes(EqualTo("s", "st_3"), one))
  }

  test("string TopN pushdown and metadata MIN/MAX on a station axis") {
    val st = ctx.dataFrame("st_strops", Fixtures.stationGrid,
      Map("station" -> 4), Seq("station", "time"))
    // ORDER BY string dim LIMIT k: sorted walk, correct answer
    val top = st.orderBy(col("station").desc).limit(3)
      .select("station").collect().map(_.getString(0))
    assert(top.toSeq == Seq("st_7", "st_7", "st_7"))
    // metadata MIN/MAX of a string dim, no partitions opened
    ReadCounters.reset()
    val r = st.agg(min("station"), max("station")).collect()(0)
    assert(r.getString(0) == "st_0" && r.getString(1) == "st_7")
    assert(ReadCounters.partitionsOpened.sum() == 0L)
    // ...and grouped-by-string metadata COUNT stays metadata-only
    ReadCounters.reset()
    val cnt = st.filter(col("station").startsWith("st_1"))
      .groupBy("station").count().collect()
    assert(cnt.length == 1 && cnt(0).getLong(1) == 10L)
    assert(ReadCounters.partitionsOpened.sum() == 0L)
  }
}
