package graft.streaming

import graft.multimodal.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time IMAGE hygiene as Structured Streaming operators — the
  * streaming counterpart of the batch image-dedup arc
  * (`image_dhash_pairs` / `image_dedup_pipeline` in PipelineQueries):
  * decode and fingerprint map-side as media arrives, exact-dedup
  * re-uploads across micro-batch boundaries, and surface near-dup
  * pairs cross-batch without ever replaying the corpus.
  *
  * Scale shape (the DocStreams contract applied to images): decode is
  * pure map-side work whose parallelism is the row partitioning; the
  * only stateful operators key by CONTENT (the 64-bit dHash, or its
  * 16-bit bands), so state volume follows distinct/duplicate image
  * density, not traffic, and the pair space is generated inside each
  * band bucket's state partition — never shuffled. Because the whole
  * signature is 8 bytes, the near-dup stream retains hashes IN state
  * and emits exact hamming-verified pairs (stronger than the text
  * LSH stream, whose candidates need a batch verify pass).
  */
object MediaStreams {

  /** Decode + fingerprint a stream of P6 image payloads: emits
    * (media_id, w, h, dhash) for every decodable payload, silently
    * dropping corrupt ones (the mediaFeatures null-for-corrupt
    * contract — an ingest stream must not die on one bad upload; the
    * batch audit pass sees them as nulls). Map-side only — safe in any
    * output mode, no watermark or state.
    */
  def fingerprintStream(media: DataFrame): DataFrame = {
    val dh = udf((bytes: Array[Byte]) =>
      scala.util.Try {
        val img = Multimodal.decodePpm(bytes)
        (img.width, img.height, Multimodal.dHash9x8(img))
      }.toOption)
    media
      .select(col("media_id").cast("long").as("media_id"),
        dh(col("payload")).as("r"))
      .filter(col("r").isNotNull)
      .select(col("media_id"), col("r._1").as("w"), col("r._2").as("h"),
        col("r._3").as("dhash"))
  }

  /** One admitted image per EXACT fingerprint across the stream's
    * whole history: first-wins dedup as keyed state — re-encoded
    * byte-identical-content re-uploads (same dHash) drop at their
    * fingerprint's state partition. One long of state per distinct
    * fingerprint; within a micro-batch the lowest media_id wins, so
    * output is batch-boundary deterministic. Production note: state
    * never expires — wire `GroupStateTimeout`/TTL where the ingest
    * horizon allows forgetting, the [[DocStreams.dedupStream]] knob.
    */
  def dedupStream(fingerprints: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = fingerprints.sparkSession
    import spark.implicits._
    fingerprints.select(col("media_id").cast("long"), col("dhash"))
      .as[(Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (dhash: Long, rows: Iterator[(Long, Long)],
         state: GroupState[Long]) => {
          if (state.exists) Iterator.empty // fingerprint already admitted
          else {
            val first = rows.map(_._1).min // lowest media_id wins the batch
            state.update(first)
            Iterator.single((first, dhash))
          }
        })
      .toDF("media_id", "dhash")
  }

  /** Streaming NEAR-dup pairs: the cross-batch counterpart of the
    * batch `image_dhash_pairs` banded hamming join. Each fingerprint
    * drops into its 4 disjoint 16-bit band buckets; keyed state per
    * (band, key) retains the (media_id, dhash) pairs seen there, so a
    * new arrival emits one exact-verified (media_a, media_b, hamming)
    * row per earlier same-bucket image within `maxHamming` — across
    * micro-batch boundaries. The pigeonhole still holds streamed:
    * hamming <= 3 over 4 bands forces SOME band equal, so every
    * qualifying pair meets in at least one bucket. A pair whose
    * images collide in several bands is emitted once per such bucket
    * — consumers `distinct()` (the batch query does the same), the
    * lsh-candidate-stream contract.
    */
  def nearDupPairStream(fingerprints: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming — 4 disjoint 16-bit bands only " +
        "guarantee completeness through hamming 3 (pigeonhole)")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = fingerprints.sparkSession
    import spark.implicits._
    val banded = fingerprints
      .select(col("media_id").cast("long").as("media_id"), col("dhash"),
        posexplode(array((0 until 4).map(p =>
          shiftright(col("dhash"), 16 * p).bitwiseAND(lit(0xffffL))): _*))
          .as(Seq("band", "key")))
      .select(col("media_id"), col("dhash"),
        concat(col("band"), lit("|"), col("key")).as("bucket"))
    banded.as[(Long, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, Long, String)],
         state: GroupState[List[(Long, Long)]]) => {
          val seen = state.getOption.getOrElse(Nil)
          val seenIds = seen.map(_._1).toSet
          // lowest media_id first: batch-boundary-deterministic output
          val arriving = rows.map(r => (r._1, r._2)).toArray
            .distinct.sortBy(_._1)
          val fresh = arriving.filterNot(r => seenIds(r._1))
          val out = List.newBuilder[(Long, Long, Long)]
          var earlier = seen
          fresh.foreach { case (id, h) =>
            earlier.foreach { case (eid, eh) =>
              val ham = java.lang.Long.bitCount(h ^ eh)
              if (ham <= maxHamming && eid != id)
                out += ((math.min(id, eid), math.max(id, eid), ham.toLong))
            }
            earlier = (id, h) :: earlier
          }
          state.update(earlier)
          out.result().iterator
        })
      .toDF("media_a", "media_b", "hamming")
  }
}
