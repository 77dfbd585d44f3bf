package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CharWindowsSpec extends SparkTestBase {

  import CharWindows.char_windows

  /** The composable reference form CharWindows replaces. */
  private def reference(n: Int) = array_distinct(expr(
    s"transform(sequence(1, length(s) - ${n - 1}), " +
      s"i -> substring(s, i, $n))"))

  test("equals array_distinct(transform(substring)) incl. multibyte") {
    import spark.implicits._
    val rows = Seq(
      "abcdefgh",
      "aaaaaaaa",                      // all-duplicate windows
      "abcabcabcabc",                  // periodic -> heavy dedup
      "ab",                            // shorter than n
      "abc",                           // exactly n
      "日本語のテキストです、長さ十分", // multibyte: char != byte windows
      "mixé ascii and ünicode ÿ text",
      "")
    val df = rows.toDF("s").filter(length(col("s")) >= 3)
    val got = df.select(char_windows(col("s"), 3).as("w"))
      .collect().map(_.getSeq[String](0))
    val want = df.select(reference(3).as("w"))
      .collect().map(_.getSeq[String](0))
    assert(got.toSeq == want.toSeq)
  }

  test("randomized law: distinct windows in first-occurrence order") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val alpha = "ab日c " // tiny alphabet forces window collisions
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(80) + 5)(alpha(rnd.nextInt(alpha.length)))
        .mkString)
    val df = rows.toDF("s").filter(length(col("s")) >= 5)
    val got = df.select(char_windows(col("s"), 5).as("w"))
      .collect().map(_.getSeq[String](0)).toSeq
    val want = df.select(reference(5).as("w"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(got == want)
  }

  test("shorter-than-n strings yield an empty array") {
    import spark.implicits._
    val out = Seq("ab").toDF("s")
      .select(char_windows(col("s"), 30).as("w"))
      .collect().head.getSeq[String](0)
    assert(out.isEmpty)
  }
}
