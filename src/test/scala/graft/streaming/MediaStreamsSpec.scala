package graft.streaming

import graft.SparkTestBase
import graft.multimodal.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming image-dedup arc: map-side decode+fingerprint (corrupt
  * payloads dropped, never fatal), exact cross-batch dedup keyed by
  * the 64-bit dHash, and exact-verified near-dup pairs emitted from
  * banded keyed state — agreeing with the batch dHash laws on the
  * same fixture bytes.
  */
class MediaStreamsSpec extends SparkTestBase {

  private def fp(id: Long): Long =
    Multimodal.dHash9x8(Multimodal.decodePpm(Multimodal.ppmFixtureLarge(id)))
  private def fpReenc(id: Long): Long =
    Multimodal.dHash9x8(Multimodal.decodePpm(Multimodal.ppmFixtureLargeReenc(id)))

  test("fingerprint stream: batch-identical hashes, corrupt rows dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Array[Byte])]
    val q = MediaStreams.fingerprintStream(
        input.toDF().toDF("media_id", "payload"))
      .writeStream.outputMode("append").format("memory")
      .queryName("media_fp_out").start()
    input.addData(
      (3L, Multimodal.ppmFixtureLarge(3L)),
      (6L, Multimodal.ppmFixtureLarge(6L)),
      (99L, Array[Byte](1, 2, 3))) // corrupt: dropped, not fatal
    q.processAllAvailable()
    q.stop()
    val out = spark.table("media_fp_out").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(3L -> fp(3L), 6L -> fp(6L)),
      s"streamed hashes must equal the batch dHash9x8: $out")
  }

  test("exact dedup admits one image per fingerprint across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val q = MediaStreams.dedupStream(input.toDF().toDF("media_id", "dhash"))
      .writeStream.outputMode("append").format("memory")
      .queryName("media_dedup_out").start()
    // batch 1: two uploads of identical content + one distinct
    input.addData((7L, 42L), (3L, 42L), (9L, 77L))
    q.processAllAvailable()
    // batch 2: a cross-batch re-upload + fresh content
    input.addData((12L, 42L), (15L, 123L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("media_dedup_out").select("media_id")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(3L, 9L, 15L), s"wrong admitted set: $out")
  }

  test("near-dup pair stream: cross-batch exact hamming, batch-law parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // ids divisible by 3 mirror the batch corpus; originals arrive in
    // batch 1, their re-encoded siblings in batch 2 — every pair must
    // surface ACROSS the boundary with the exact hamming the batch
    // law computes, and unrelated images must not pair
    val ids = Seq(0L, 3L, 6L, 9L, 12L)
    val input = MemoryStream[(Long, Long)]
    val pairs = MediaStreams.nearDupPairStream(
      input.toDF().toDF("media_id", "dhash"))
    val q = pairs.writeStream.outputMode("append").format("memory")
      .queryName("media_pairs_out").start()
    input.addData(ids.map(id => (2 * id, fp(id))): _*)
    q.processAllAvailable()
    input.addData(ids.map(id => (2 * id + 1, fpReenc(id))): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("media_pairs_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the batch brute force over the same 10 signatures
    val sigs = ids.flatMap(id =>
      Seq(2 * id -> fp(id), 2 * id + 1 -> fpReenc(id))).toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      ham = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if ham <= 3
    } yield (a, b, ham.toLong)).toSet
    assert(got == want,
      s"streamed pairs must equal the batch law: got $got want $want")
    assert(want.nonEmpty, "fixture must realize near-dup pairs")
    // at least one pair crossed the batch boundary (orig then reenc)
    assert(want.exists { case (a, b, _) => a % 2 == 0 && b % 2 == 1 })
  }
}
