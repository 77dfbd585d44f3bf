package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimHash16Spec extends SparkTestBase {

  /** The composable 16-fold form SimHash16 replaces. */
  private def reference = {
    val h = transform(col("w"), t => md5(t.cast("binary")))
    val hexHi = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bits = (0 until 16).map { p =>
      val vote = aggregate(h, lit(0L), (acc, x) =>
        acc + when(substring(x, p + 1, 1).isin(hexHi: _*), 1L)
          .otherwise(-1L))
      when(vote > 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  test("one-pass expression equals the 16 composable aggregate folds") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Seq("spark", "join", "scan", "the", "a", "批", "流")
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(40) + 1)(vocab(rnd.nextInt(vocab.length))))
    val df = rows.toDF("w")
    val got = df.select(SimHash16.simhash16(col("w")).as("s"))
      .collect().map(_.getLong(0)).toSeq
    val want = df.select(reference.as("s"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
  }

  test("empty token array votes all bits negative -> signature 0") {
    import spark.implicits._
    val out = Seq(Seq.empty[String]).toDF("w")
      .select(SimHash16.simhash16(col("w"))).collect().head.getLong(0)
    assert(out == 0L)
  }
}
