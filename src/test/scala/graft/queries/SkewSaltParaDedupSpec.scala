package graft.queries

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._

/** Pins for the round-12 late additions.
  *
  * `join_skew_salted`: the manual skew lever must actually spread the
  * hot key — the shuffle/join keys include the salt (so a hot
  * l_orderkey lands in 8 partitions, not one straggler) and the result
  * is salt-invariant (equals the plain join).
  *
  * `para_dedup`: the C4-style paragraph dedup is re-implemented here
  * as a sequential driver-side reference over the collected corpus and
  * compared exactly — an independent check alongside the DuckDB gate —
  * plus a plan pin that block construction stays map-side (no Window,
  * which would mean a per-doc sort shuffle snuck in).
  */
class SkewSaltParaDedupSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def withNoAutoBroadcast[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, "-1"); f }
    finally spark.conf.set(key, prev)
  }

  test("salted join: salt is part of the join keys; no broadcast") {
    withNoAutoBroadcast {
      val plan = SparkEntry.queries("join_skew_salted")(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled join with broadcast off:\n$plan")
      val joinLine = plan.linesIterator
        .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
        .getOrElse("")
      assert(joinLine.contains("salt"),
        s"join keys must include the salt:\n$joinLine")
      assert(!plan.contains("BroadcastHashJoin"), plan)
    }
  }

  test("salted join result equals the plain join") {
    val salted = SparkEntry.queries("join_skew_salted")(spark, sf)
      .orderBy("o_orderpriority").collect().toSeq
    val plain = graft.Tables.lineitem(spark, sf)
      .join(graft.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("string").cast("double").as("qty"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }

  test("para_dedup matches a sequential reference implementation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // sequential reference: first global occurrence of each 10-token
    // block wins (docs scanned in doc_id order, blocks in order)
    val seen = scala.collection.mutable.HashSet[String]()
    val expected = docs.flatMap { case (id, text) =>
      val blocks = text.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
      val kept = blocks.filter(b => seen.add(b))
      if (kept.isEmpty) None
      else Some((id, kept.mkString(" "), kept.size.toLong))
    }.toSeq
    val got = SparkEntry.queries("para_dedup")(spark, sf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("para_dedup plan: one corpus scan, no join, no window") {
    val plan = SparkEntry.queries("para_dedup")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Window"),
      s"block split/reassembly must not use a window sort:\n$plan")
    assert("Scan ".r.findAllIn(plan).length == 1,
      s"min_by winner selection must not re-scan the corpus:\n$plan")
    assert(!plan.contains("Join"),
      s"winner selection must aggregate, not join back:\n$plan")
  }

  test("dedup_within_doc: row-local transform — zero exchanges") {
    val plan = SparkEntry.queries("dedup_within_doc")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"),
      s"a per-document transform must not shuffle:\n$plan")
    assert(!plan.contains("Generate"),
      s"the block filter must stay a higher-order array op, not explode:\n$plan")
  }

  test("dedup_within_doc matches a sequential reference implementation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = docs.map { case (id, text) =>
      val blocks = text.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
      val kept = blocks.foldLeft(Vector.empty[String]) {
        (acc, b) => if (acc.contains(b)) acc else acc :+ b
      }
      (id, kept.mkString(" "), kept.size.toLong)
    }.toSeq
    val got = SparkEntry.queries("dedup_within_doc")(spark, sf)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }
}
