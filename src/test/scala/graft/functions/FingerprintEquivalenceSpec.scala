package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The single-pass native expressions must be value-identical to the
  * composable Spark forms they replace — that equivalence is what makes
  * the DuckDB oracles (written against the composable semantics) valid.
  */
class FingerprintEquivalenceSpec extends SparkTestBase {

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "THE QUICK brown FOX the the fox",
    "  leading and  double  spaces ",
    "trailing space ",
    " ",
    "",
    "single",
    "ünïcödé wörds müst wörk töö ünïcödé",
    "zahlen 123 und zeichen !?; gemischt 123",
    "été café naïve été"
  )

  test("word_set_fingerprint == md5(concat_ws(array_sort(array_distinct(split(lower)))))") {
    import spark.implicits._
    val df = samples.toDF("text")
    val rows = df.select(
      WordSetFingerprint.word_set_fingerprint(col("text")).as("fast"),
      md5(concat_ws(" ",
        array_sort(array_distinct(split(lower(col("text")), " "))))
        .cast("binary")).as("composable")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("custom expressions keep their Project inside whole-stage codegen") {
    // a CodegenFallback expression would exclude the whole Project from
    // WSCG (CollapseCodegenStages), splitting the span; RefCallCodegen
    // keeps it inside — the Project line carries the codegen '*'
    val df = spark.range(64)
      .select(concat(lit("w "), col("id").cast("string")).as("text"))
      .select(
        WordSetFingerprint.word_set_fingerprint(col("text")).as("fp"),
        MinHashMd5.minhash_md5(
          WordShingles.word_shingles(split(col("text"), " "), 2), 4).as("sig"))
    df.collect() // force compile: codegen errors would fall back silently
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator
      .find(_.contains("word_set_fingerprint")).getOrElse(fail(plan))
    assert(projLine.trim.matches("^[+:\\-\\s]*\\*\\(\\d+\\).*"), plan)
  }

  test("minhash_md5 slices == array_min(transform(substr(md5(token))))") {
    import spark.implicits._
    val df = samples.filter(_.nonEmpty).toDF("text")
      .select(split(col("text"), " ").as("tok"))
    val slices = (0 until 4).map { j =>
      array_min(transform(col("tok"),
        t => substring(md5(t.cast("binary")), j * 8 + 1, 8))).as(s"c$j")
    }
    val rows = df.select(
      Seq(MinHashMd5.minhash_md5(col("tok"), 4).as("fast")) ++ slices: _*)
      .collect()
    rows.foreach { r =>
      val fast = r.getSeq[String](0)
      (0 until 4).foreach(j => assert(fast(j) == r.getString(j + 1), r.toString))
    }
  }

  test("simhash64 == composable per-bit nibble voting over md5 hex") {
    import spark.implicits._
    val df = samples.toDF("text")
      .select(split(lower(col("text")), " ").as("tok"))
      .withColumn("h", transform(col("tok"), t => md5(t.cast("binary"))))
    // bit p votes on bit (p % 4) of hex nibble (p / 4) — the exact
    // semantics the DuckDB oracle replays
    val slow = (0 until 60).map { p =>
      val vote = aggregate(col("h"), lit(0L), (acc, x) => {
        val nib = conv(substring(x, p / 4 + 1, 1), 16, 10).cast("long")
        acc + when(shiftright(nib, p % 4).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)
      })
      when(vote > 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    val rows = df.select(SimHash64.simhash64(col("tok")).as("fast"),
      slow.as("slow")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("simhash64: duplicate texts collide, empty token list is 0") {
    import spark.implicits._
    val df = Seq("alpha beta gamma", "alpha beta gamma").toDF("text")
      .select(SimHash64.simhash64(split(col("text"), " ")).as("s"))
    val Array(a, b) = df.collect().map(_.getLong(0))
    assert(a == b)
    val empty = Seq(Seq.empty[String]).toDF("tok")
      .select(SimHash64.simhash64(col("tok")).as("s"))
      .collect().head.getLong(0)
    assert(empty == 0L)
  }
}
