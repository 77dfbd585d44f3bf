package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkTestBase {

  import MisraGries.misra_gries

  test("guarantee: every item above n/(k+1) survives merged partials") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // skewed stream: few heavy items over a long tail
    val rows = Seq.fill(20000) {
      val r = rnd.nextInt(100)
      if (r < 30) s"heavy${r % 3}"            // 3 items at ~10% each
      else if (r < 50) s"mid${r % 7}"          // 7 items at ~2.9% each
      else s"tail${rnd.nextInt(5000)}"         // noise
    }
    val k = 20
    val cand = rows.toDF("t").repartition(16)
      .agg(misra_gries(col("t"), k).as("mg"))
      .collect()(0).getSeq[String](0).toSet
    assert(cand.size <= k)
    val exact = rows.groupBy(identity).view.mapValues(_.size)
    val mustSurvive = exact.filter(_._2 > rows.size / (k + 1)).keySet
    assert(mustSurvive.nonEmpty, "fixture lost its heavy items")
    mustSurvive.foreach(h => assert(cand.contains(h),
      s"$h above n/(k+1) missing from candidates $cand"))
  }

  test("small distinct sets come back exactly; nulls ignored") {
    import spark.implicits._
    val cand = Seq(Some("a"), Some("b"), Some("a"), None)
      .toDF("t").repartition(4)
      .agg(misra_gries(col("t"), 8).as("mg"))
      .collect()(0).getSeq[String](0)
    // under k distinct -> no decrement ever fires -> exact contents
    assert(cand == Seq("a", "b"))
  }

  test("a summary deserialized with a smaller k shrinks back below it") {
    // streaming state written at k=8 and re-read at k=4 (operator
    // reconfigured across a restart): the trim guard must keep firing
    // so state stays bounded instead of growing on every new token
    val big = new MGSummary(8)
    (0 until 8).foreach(i => big.add(s"t$i", 5L))
    val reread = MGSummary.fromBytes(4, MGSummary.toBytes(big))
    assert(reread.counts.size == 8)
    (100 until 140).foreach(i => reread.add(s"n$i", 1L))
    assert(reread.counts.size <= 8,
      s"state grew past its pre-restart size: ${reread.counts.size}")
    (200 until 260).foreach(i => reread.add(s"m$i", 1L))
    assert(reread.counts.size <= 4,
      s"state never shrank to the new k: ${reread.counts.size}")
  }

  test("weighted merge absorbs a dominant partial") {
    // one partition holds a single dominant item, others are noise;
    // the dominant item must survive any merge order
    import spark.implicits._
    val rows = Seq.fill(5000)("dominant") ++
      (0 until 5000).map(i => s"noise$i")
    val cand = rows.toDF("t").repartition(32)
      .agg(misra_gries(col("t"), 10).as("mg"))
      .collect()(0).getSeq[String](0)
    assert(cand.contains("dominant"), s"lost the 50% item: $cand")
  }
}
