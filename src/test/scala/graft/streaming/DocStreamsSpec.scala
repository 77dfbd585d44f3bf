package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DocStreamsSpec extends SparkTestBase {

  final case class Doc(docId: Long, lang: String, text: String)

  test("streaming intake screens eval-set overlap and short docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // static "benchmark" corpus: one distinctive 5-gram
    val evalDocs = Seq(("the quick brown fox jumps over the lazy dog"))
      .toDF("text")
    val filter = DocStreams.evalSetFilter(evalDocs, 100L, 0.001)

    val input = MemoryStream[Doc]
    val admitted = DocStreams.admit(
      input.toDF().withColumnRenamed("docId", "doc_id"), filter, 4)
    val q = DocStreams.admittedPerLang(admitted)
      .writeStream.outputMode("update").format("memory")
      .queryName("admit_out").start()

    input.addData(
      Doc(1L, "en", "a clean document with enough tokens here"),
      // contains "quick brown fox jumps over" -> quarantined
      Doc(2L, "en", "stolen quick brown fox jumps over text body"),
      Doc(3L, "en", "too short"),
      Doc(4L, "de", "ein sauberes dokument mit genug inhalt"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("admit_out").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("en" -> 1L, "de" -> 1L),
      s"screening admitted the wrong set: $out")
  }

  test("streaming dedup admits one doc per fingerprint across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    final case class D(doc_id: Long, text: String)
    val input = MemoryStream[(Long, String)]
    val deduped = DocStreams.dedupStream(
      input.toDF().toDF("doc_id", "text"))
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()

    // batch 1: two copies of the same content (word-set fingerprint is
    // order/multiplicity-insensitive) + one distinct doc
    input.addData((7L, "alpha beta gamma"), (3L, "gamma beta alpha"),
      (9L, "something else entirely"))
    q.processAllAvailable()
    // batch 2: a replay of batch-1 content + genuinely new content
    input.addData((12L, "alpha beta gamma"), (15L, "fresh new content"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // 3 wins over 7 inside batch 1; 12 is a cross-batch dup; 9/15 pass
    assert(out == Set(3L, 9L, 15L), s"wrong admitted set: $out")
  }

  test("streaming LSH emits cross-batch near-dup candidate pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, String)]
    val pairs = DocStreams.lshCandidateStream(
      input.toDF().toDF("doc_id", "text"))
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName("lsh_out").start()

    // batch 1: two identical docs (identical signature -> both band
    // buckets collide, pair emitted once per bucket) + one distinct doc
    input.addData((5L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (9L, "zeta eta theta iota kappa"))
    q.processAllAvailable()
    // batch 2: a replay of batch-1 content must pair against BOTH
    // earlier copies from bucket state; unrelated content pairs
    // nothing; NULL-text docs have NULL band keys and must vanish
    // instead of collapsing into a shared bucket
    input.addData((14L, "alpha beta gamma delta epsilon"),
      (21L, "completely different words here now"),
      (30L, null), (31L, null))
    q.processAllAvailable()
    q.stop()

    // set-collapse the double-band emissions (candidates are a
    // pre-filter by contract; consumers dedup)
    val out = spark.table("lsh_out").as[(Long, Long)].collect().toSet
    assert(out == Set((2L, 5L), (2L, 14L), (5L, 14L)),
      s"wrong candidate pair set: $out")
  }

  test("trending tokens: bounded per-hour state keeps the heavy token") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    def ts(min: Int): Timestamp = new Timestamp(1700000000000L / 3600000 *
      3600000 + min * 60000L)

    val input = MemoryStream[(Timestamp, String)]
    val out = DocStreams.trendingTokens(
      input.toDF().toDF("ts", "text"), k = 4)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("trend_out").start()

    // batch 1: "viral" dominates hour 0; noise fills the counters.
    // The run of consecutive/leading/trailing spaces splits into ""
    // tokens OFTEN ENOUGH to win a Misra-Gries counter — they must be
    // filtered out, not crowned a candidate
    input.addData(
      (ts(1), "viral viral viral viral viral viral"),
      (ts(2), "  noise1   noise2   noise3   noise4   noise5  "))
    q.processAllAvailable()
    // batch 2: more of the same hour — state folds incrementally —
    // plus a different hour with its own heavy token
    input.addData(
      (ts(3), "viral viral viral noise6 noise7"),
      (ts(70), "other other other other quiet1"))
    q.processAllAvailable()
    q.stop()

    // update mode: keep each (hour, shard)'s LAST emitted row, then
    // union shards per hour — the consumer contract
    val rows = spark.table("trend_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[String](2))
    val byHour = rows.groupBy(_._1).map { case (k, rs) => k -> rs.last._2 }
      .groupBy(_._1._1).map { case (h, m) => h -> m.values.flatten.toSet }
    assert(byHour.size == 2)
    val Seq(h0, h1) = byHour.keys.toSeq.sorted
    assert(byHour(h0).contains("viral"),
      s"hour-0 candidates lost the dominant token: ${byHour(h0)}")
    assert(byHour(h1).contains("other"),
      s"hour-1 candidates lost the dominant token: ${byHour(h1)}")
    // empty tokens from whitespace runs never occupy counters
    assert(rows.forall(!_._2.contains("")),
      s"empty token surfaced as a candidate: ${rows.toSeq}")
  }

  test("bloom screening never passes a true eval-set overlap") {
    import spark.implicits._
    val evalDocs = Seq.tabulate(50)(i =>
      s"benchmark question number $i asks about topic $i in detail")
      .toDF("text")
    val filter = DocStreams.evalSetFilter(evalDocs, 1000L, 0.01)
    // every eval doc itself must be flagged (no false negatives)
    val docs = evalDocs
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(0L))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val admitted = DocStreams.admit(docs, filter, 1)
    assert(admitted.count() == 0L,
      "an eval-set document slipped through the bloom screen")
  }
}
