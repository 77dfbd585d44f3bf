package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Laws of the mergeable bloom aggregate.
  *
  * The bits of a bloom filter are a pure function of the item SET
  * (putString sets fixed bit positions idempotently; mergeInPlace is
  * bitwise OR), so the aggregate must be byte-identical under ANY
  * partitioning / partial-merge order — stronger than "no false
  * negatives", and the property the FileBloomIndex append path's
  * merge-equals-rebuild pin stands on. Checked over seeded random
  * multisets at several partitionings.
  */
class BloomAggSpec extends SparkTestBase {

  private def aggBytes(items: Seq[String], parts: Int): Array[Byte] = {
    val sqlc = spark
    import sqlc.implicits._
    items.toDF("k").repartition(parts)
      .agg(BloomAgg.bloom_agg(col("k"), 128, 0.01).as("b"))
      .head().getAs[Array[Byte]]("b")
  }

  test("bits are partition-invariant and contain every inserted item") {
    val rnd = new scala.util.Random(42)
    for (case_ <- 0 until 6) {
      val n = 1 + rnd.nextInt(60)
      // duplicated, variable-length keys — a multiset, not a set
      val items = Seq.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(12))
        .mkString) ++ Seq.fill(rnd.nextInt(10))("dup")
      val ref = aggBytes(items, 1)
      for (p <- Seq(3, 7)) {
        val got = aggBytes(items, p)
        assert(java.util.Arrays.equals(ref, got),
          s"case $case_: bytes differ between 1 and $p partitions")
      }
      val f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(ref))
      items.foreach(i => assert(f.mightContainString(i),
        s"case $case_: false negative for '$i'"))
    }
  }

  test("null keys are skipped, not inserted") {
    val sqlc = spark
    import sqlc.implicits._
    val withNulls = Seq(Some("a"), None, Some("b"), None).toDF("k")
    val b = withNulls
      .agg(BloomAgg.bloom_agg(col("k"), 128, 0.01).as("b"))
      .head().getAs[Array[Byte]]("b")
    val ref = Seq("a", "b").toDF("k")
      .agg(BloomAgg.bloom_agg(col("k"), 128, 0.01).as("b"))
      .head().getAs[Array[Byte]]("b")
    assert(java.util.Arrays.equals(b, ref),
      "nulls must leave the filter bits untouched")
  }
}
