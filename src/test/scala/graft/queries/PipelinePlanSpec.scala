package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Plan-shape pins for the pipeline queries whose 100 TB viability
  * depends on a specific physical plan, not just a correct answer.
  */
class PipelinePlanSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  test("lsh_candidate_pairs: banded self-join reuses the signature exchange") {
    val df = SparkEntry.queries("lsh_candidate_pairs")(spark, sf)
    df.collect() // AQE finalizes stages (incl. reuse) at execution
    val plan = df.queryExecution.executedPlan
    // the expensive minhash signature subplan must be computed ONCE and
    // its shuffle reused on the other side of the self-join — reuse
    // shows up as ReusedExchangeExec both with and without AQE
    val reused = collectWithSubqueries(plan) { case r: ReusedExchangeExec => r }
    assert(reused.nonEmpty,
      s"signature exchange not reused (minhash would run twice):\n$plan")
  }

  test("ann_ivf_bucketed: probe cell is a partition filter at the scan") {
    val df = SparkEntry.queries("ann_ivf_bucketed")(spark, sf)
    val expect = SparkEntry.queries("ann_ivf")(spark, sf).collect()
    assert(df.collect().toSeq == expect.toSeq,
      "bucketed IVF must return exactly the one-shot IVF answer")
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    // the cell predicate prunes directories, it is not a data filter
    assert(scans.exists(_.partitionFilters.exists(
      _.toString.contains("bucket"))),
      s"no bucket partition filter in:\n${df.queryExecution.executedPlan}")
  }

  test("token_encode: vocab joins back via broadcast, not a sort-merge") {
    val df = SparkEntry.queries("token_encode")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("decontam_ngram: eval-set grams broadcast onto the corpus side") {
    val df = SparkEntry.queries("decontam_ngram")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"corpus-wide shuffle join in decontam_ngram:\n$plan")
  }

  test("tfidf_top_terms: df table broadcast, no corpus-side merge join") {
    val df = SparkEntry.queries("tfidf_top_terms")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("kmeans_embed: codebook is broadcast; no cartesian product") {
    val df = SparkEntry.queries("kmeans_embed")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"centroids not broadcast in kmeans plan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in kmeans plan:\n$plan")
  }

  test("embed_neardup: no cartesian/nested-loop join at any SF") {
    val df = SparkEntry.queries("embed_neardup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"nested loop in embed_neardup plan:\n$plan")
  }

  test("simhash_pairs: signature exchange reused; pairs join is equi") {
    val df = SparkEntry.queries("simhash_pairs")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // one simhash computation, reused on the other self-join side
    val reused = collectWithSubqueries(plan) { case r: ReusedExchangeExec => r }
    assert(reused.nonEmpty,
      s"simhash exchange not reused (signatures computed twice):\n$plan")
    val s = plan.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in simhash_pairs plan:\n$s")
  }

  test("semdedup: pair search is an equi-join on the cluster id") {
    val df = SparkEntry.queries("semdedup")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    // the quadratic-risk pair join must KEY on the cluster id (hash or
    // merge equi-join, cosine+id as residual condition) — the only
    // nested loops allowed are the k-row broadcast codebook legs
    // inside KMeans.assign, never a row-level pair loop
    assert(!s.contains("CartesianProduct"), s"cartesian in semdedup:\n$s")
    val pairJoinKeyed = s.linesIterator.exists(l =>
      (l.contains("BroadcastHashJoin [cluster") ||
        l.contains("SortMergeJoin [cluster")) && l.contains("dot_f64"))
    assert(pairJoinKeyed,
      s"within-cluster pair join not keyed on cluster id:\n$s")
  }
}
