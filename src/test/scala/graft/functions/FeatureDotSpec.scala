package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FeatureDotSpec extends SparkTestBase {

  test("native dot equals the composable element_at fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val n = 16
    val w = Array.fill(n)(rnd.nextLong() % 1000L)
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(12))((rnd.nextInt(n), rnd.nextInt(40).toLong + 1L)))
    val df = rows.toDF("raw")
      .select(transform(col("raw"),
        e => struct(e.getField("_1").as("f"),
          e.getField("_2").as("x"))).as("fs"))
    val wl = typedlit(w.toSeq)
    val ref = aggregate(col("fs"), lit(0L),
      (acc, s) => acc + s.getField("x") *
        element_at(wl, s.getField("f") + 1))
    val got = df.select(FeatureDot.feature_dot(col("fs"), w).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val want = df.select(ref.as("s")).collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("empty feature array scores 0") {
    import spark.implicits._
    val df = Seq(Seq.empty[(Int, Long)]).toDF("raw")
      .select(transform(col("raw"),
        e => struct(e.getField("_1").as("f"),
          e.getField("_2").as("x"))).as("fs"))
    val out = df.select(FeatureDot.feature_dot(col("fs"), Array(1L, 2L)))
      .collect().head.getLong(0)
    assert(out == 0L)
  }
}
