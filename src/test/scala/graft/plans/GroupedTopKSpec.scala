package graft.plans

import graft.SparkTestBase
import graft.operators.TopKOps
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GroupedTopKSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  test("grouped top-k matches the window formulation exactly") {
    val custom = TopKOps.topKPerGroup(docs, Seq("lang"),
      Seq("n_chars" -> false, "doc_id" -> true), 3)
      .orderBy("lang", "doc_id").collect().toSeq
    val w = Window.partitionBy("lang").orderBy(col("n_chars").desc, col("doc_id"))
    val expected = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .orderBy("lang", "doc_id").collect().toSeq
    assert(custom == expected)
  }

  test("plan is partial+final heaps with a k-bounded shuffle, no window sort") {
    val df = TopKOps.topKPerGroup(docs.repartition(8), Seq("lang"),
      Seq("n_chars" -> false, "doc_id" -> true), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collectWithSubqueries(plan) { case e: GroupedTopKExec => e }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final GroupedTopKExec pair in:\n$plan")
    val s = plan.toString
    assert(!s.contains("WindowExec") && !s.contains("Window "),
      s"window sort crept into the top-k plan:\n$plan")
    assert(df.count() == 15, "3 rows per language expected")
  }

  test("randomized: heap operator == window formulation for many shapes") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 500 + trial * 300
      val rows = Seq.tabulate(n)(i =>
        (i.toLong, s"g${rng.nextInt(3 + trial * 40)}", rng.nextInt(50).toLong))
      val df = rows.toDF("doc_id", "lang", "n_chars").repartition(5 + trial)
      val k = 1 + trial * 2
      val custom = TopKOps.topKPerGroup(df, Seq("lang"),
        Seq("n_chars" -> false, "doc_id" -> true), k)
        .orderBy("lang", "doc_id").collect().toSeq
      val w = Window.partitionBy("lang")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val expected = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("lang", "doc_id").collect().toSeq
      assert(custom == expected, s"trial $trial (n=$n, k=$k) diverged")
    }
  }

  test("groups smaller than k emit all their rows") {
    import spark.implicits._
    val tiny = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("doc_id", "lang", "n_chars")
    val out = TopKOps.topKPerGroup(tiny, Seq("lang"),
      Seq("n_chars" -> false, "doc_id" -> true), 3)
    assert(out.count() == 3)
  }
}
