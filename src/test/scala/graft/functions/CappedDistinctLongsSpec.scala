package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CappedDistinctLongsSpec extends SparkTestBase {

  import CappedDistinctLongs.capped_distinct_longs

  test("exact sorted set under the cap; NULL past it; dedup within group") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L), ("a", 1L), ("a", 3L), ("a", 2L), // 3 distinct, dups
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L), // 4 distinct = cap + 1
      ("c", 9L))
      .toDF("k", "v")
      .repartition(8) // scatter each group across partitions -> merges
    val out = df.groupBy("k")
      .agg(capped_distinct_longs(col("v"), 3).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1)))
      .toMap
    assert(out("a").contains(Seq(1L, 2L, 3L)), s"a: ${out("a")}")
    assert(out("b").isEmpty, s"overflow must be NULL, got ${out("b")}")
    assert(out("c").contains(Seq(9L)))
  }

  test("randomized equivalence with collect_set under the cap") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(5000)(i =>
      (rnd.nextInt(300), rnd.nextInt(12).toLong))
    val df = rows.toDF("k", "v").repartition(16)
    val cap = 6
    val got = df.groupBy("k")
      .agg(capped_distinct_longs(col("v"), cap).as("ids"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1)))
      .toMap
    val expect = rows.groupBy(_._1).map { case (k, vs) =>
      val s = vs.map(_._2).distinct.sorted
      k -> (if (s.size > cap) None else Some(s))
    }
    assert(got.size == expect.size)
    expect.foreach { case (k, e) =>
      assert(got(k) == e, s"key $k: got ${got(k)}, want $e")
    }
  }

  test("nulls are ignored, empty group yields empty array") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("b", None))
      .toDF("k", "v")
    val out = df.groupBy("k")
      .agg(capped_distinct_longs(col("v"), 3).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1)))
      .toMap
    assert(out("a").contains(Seq(1L)))
    assert(out("b").contains(Seq.empty[Long]),
      s"all-null group must be empty array, got ${out("b")}")
  }
}
