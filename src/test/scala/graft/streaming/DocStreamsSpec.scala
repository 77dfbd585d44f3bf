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
