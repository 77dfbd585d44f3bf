package graft.streaming

import graft.functions.WordShingles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Ingest-time corpus hygiene as Structured Streaming operators — the
  * streaming counterpart of the batch cleaning family (dedup_*,
  * decontam_ngram, quality_score in graft.queries.PipelineQueries).
  *
  * Decontamination on a stream cannot be the batch shape (an equi-join
  * against the eval-gram set would need stateful dedup of the exploded
  * grams): instead the eval set is distilled ONCE into a bloom filter
  * and every arriving document is screened map-side — no shuffle, no
  * state, O(1) per gram. False positives quarantine a few clean docs
  * (tunable fpp); false negatives are impossible, which is the
  * direction an eval-set filter must never fail in. At 100 TB the
  * filter is a few MB broadcast with the task closures; the batch
  * `decontam_ngram` join remains the exact audit pass.
  */
object DocStreams {

  /** Distill the static eval corpus into a gram bloom filter
    * (driver-side aggregate of a small table; rebuilt per release).
    */
  def evalSetFilter(evalDocs: DataFrame, expectedGrams: Long,
      fpp: Double): BloomFilter =
    evalDocs
      .select(explode(WordShingles.word_shingles(
        split(lower(col("text")), " "), 5)).as("g"))
      .stat.bloomFilter("g", expectedGrams, fpp)

  /** Screen a document stream: flag eval-set 5-gram overlap via the
    * bloom filter and gate on a minimum token count. Map-side only —
    * safe in any streaming mode, no watermark or state required.
    * Emits the admitted docs with their screening columns.
    */
  def admit(docs: DataFrame, filter: BloomFilter, minTokens: Int): DataFrame = {
    val mightOverlap = udf((sh: Seq[String]) =>
      sh != null && sh.exists(filter.mightContainString))
    docs
      .withColumn("sh", WordShingles.word_shingles(
        split(lower(col("text")), " "), 5))
      .withColumn("contaminated", mightOverlap(col("sh")))
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .filter(!col("contaminated") && col("n_tokens") >= minTokens)
      .drop("sh", "contaminated")
  }

  /** Running per-language admitted counts (update mode; state is one
    * row per language, bounded by construction).
    */
  def admittedPerLang(admitted: DataFrame): DataFrame =
    admitted.groupBy("lang")
      .agg(count(lit(1)).as("n_admitted"), sum("n_tokens").as("sum_tokens"))

  /** One admitted document per fingerprint across the STREAM's whole
    * history: exact first-wins dedup as keyed state
    * (`flatMapGroupsWithState`, append mode). The state store holds one
    * long per distinct fingerprint, partitioned by fingerprint hash —
    * the scale shape of streaming exact dedup (state volume follows
    * distinct content, not traffic; a replayed or duplicated document
    * hits its fingerprint's partition and is dropped there, no global
    * structure anywhere). Within one micro-batch the lowest doc_id of
    * a fingerprint group wins, so results are batch-boundary
    * deterministic. Production note: state here never expires — bound
    * it with `GroupStateTimeout`/TTL when the corpus allows forgetting
    * (e.g. a crawl whose recrawl horizon is known), exactly where that
    * knob would plug in.
    */
  def dedupStream(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val withFp = docs.select(col("doc_id").cast("long").as("doc_id"),
      col("text"),
      graft.functions.WordSetFingerprint.word_set_fingerprint(col("text"))
        .as("fp"))
    withFp.as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (fp: String, rows: Iterator[(Long, String, String)],
         state: GroupState[Long]) => {
          if (state.exists) Iterator.empty // fingerprint already admitted
          else {
            val first = rows.minBy(_._1) // lowest doc_id wins the batch
            state.update(first._1)
            Iterator.single((first._1, first._2, fp))
          }
        })
      .toDF("doc_id", "text", "fp")
  }

  /** Streaming NEAR-dup candidate pairs: the cross-batch counterpart of
    * the batch `lsh_candidate_pairs` query. Each arriving document is
    * MinHash-signed (4 md5 hashes over word-3-gram shingles, the exact
    * batch signature) and dropped into its 2 LSH band buckets; keyed
    * state per bucket retains the doc_ids seen there, so a new arrival
    * emits one (doc_a, doc_b) candidate per earlier same-bucket doc —
    * across micro-batch boundaries, without ever replaying the corpus.
    *
    * Scale shape: state is partitioned by bucket key (band || two band
    * sigs), i.e. by CONTENT — a bucket's state holds only the docs that
    * near-collide there, so state volume follows duplicate density, not
    * traffic. Pairs for a new doc are generated inside its bucket's
    * state partition: the pair space is never shuffled, exactly like
    * the batch shape. A pair whose docs collide in BOTH bands is
    * emitted twice (once per bucket group) — candidates are a
    * best-effort pre-filter by contract, consumers dedup/verify
    * (neardup_jaccard is the batch-side audit). Within a batch the
    * lower doc_id is enumerated first, so output is batch-boundary
    * deterministic. Production note: buckets never expire — wire
    * `GroupStateTimeout`/TTL where the recrawl horizon allows
    * forgetting, same knob as [[dedupStream]].
    */
  def lshCandidateStream(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = docs.select(col("doc_id").cast("long").as("doc_id"),
      graft.functions.MinHashMd5.minhash_md5(WordShingles.word_shingles(
        split(lower(col("text")), " "), 3), 4).as("sig"))
    // concat (null-propagating), NOT concat_ws: a NULL/empty-text doc
    // has NULL signature slices, and concat_ws would silently drop
    // them, collapsing every such doc into the constant "b0"/"b1"
    // buckets — unbounded state + O(n^2) bogus pairs. With concat the
    // bucket is NULL and the row is filtered, matching the batch shape
    // where a NULL band key never equi-joins.
    val banded = sig.select(col("doc_id"), explode(array(
        concat(lit("b0|"), col("sig")(0), col("sig")(1)),
        concat(lit("b1|"), col("sig")(2), col("sig")(3)))).as("bucket"))
      .filter(col("bucket").isNotNull)
    banded.as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, String)],
         state: GroupState[List[Long]]) => {
          val seen = state.getOption.getOrElse(Nil)
          // membership via a Set: hot buckets are the EXPECTED case here
          // (near-identical docs collapse into one bucket by design), and
          // List.contains per arriving doc would make each batch
          // O(|bucket|^2); the list itself stays as state for stable
          // pair-enumeration order
          val seenSet = seen.toSet
          val arriving = rows.map(_._1).toArray.distinct.sorted
          val fresh = arriving.filterNot(seenSet)
          val pairs = Iterator.unfold((fresh.toList, seen)) {
            case (Nil, _) => None
            case (d :: rest, earlier) =>
              Some((earlier.map(e => (math.min(d, e), math.max(d, e))),
                (rest, d :: earlier)))
          }.flatten.toList
          state.update(fresh.toList reverse_::: seen)
          pairs.iterator
        })
      .toDF("doc_a", "doc_b")
  }

  /** Trending tokens per hour with BOUNDED keyed state: one
    * Misra–Gries summary (k counters, a few KB) per (hour, shard)
    * bucket, folded incrementally as batches arrive — the streaming
    * form of the batch `heavy_hitters` candidate stage. State is the
    * summary's serialized bytes, through the same serde the batch
    * aggregate ships across its merge shuffle; update-mode emits a
    * bucket's refreshed candidate array each batch it changes.
    *
    * Sharding is BY TOKEN HASH, which is what keeps both the scale
    * and the guarantee: an hour of peak traffic is `nShards` parallel
    * state tasks instead of one hot key, and because a given token's
    * entire count lands in exactly one shard, the per-shard guarantee
    * (every token above 1/(k+1) of the SHARD's traffic is present)
    * implies the per-hour one — shard traffic is at most the hour's,
    * so any token above 1/(k+1) of the hour is above 1/(k+1) of its
    * shard. Consumers union the shards' candidate arrays per hour.
    * Exact counts, when needed, come from the batch verify pass over
    * the hour's stored slice — candidates here, verification there,
    * the same contract as lshCandidateStream. State never expires;
    * wire `GroupStateTimeout` to the retention horizon in production.
    */
  def trendingTokens(docs: DataFrame, k: Int,
      nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    // null ts would surface as a null hour_sec through the
    // non-nullable tuple encoder and kill the query — drop such rows
    // (null TEXT is already safe: split -> null array -> explode
    // emits nothing)
    val toks = docs.filter(col("ts").isNotNull).select(
      date_trunc("hour", col("ts")).cast("long").as("hour_sec"),
      explode(split(lower(col("text")), " ")).as("token"))
      // consecutive spaces split into "" tokens that would occupy
      // Misra-Gries counters and surface as "" candidates, wasting
      // k-budget per shard; a batch verify pass over the stored slice
      // must apply the same token <> '' restriction when counting
      .filter(col("token") =!= "")
      .select(col("hour_sec"),
        pmod(xxhash64(col("token")), lit(nShards.toLong)).as("shard"),
        col("token"))
    toks.as[(Long, Long, String)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(
        (key: (Long, Long), rows: Iterator[(Long, Long, String)],
         state: GroupState[Array[Byte]]) => {
          val summary = state.getOption
            .map(graft.functions.MGSummary.fromBytes(k, _))
            .getOrElse(new graft.functions.MGSummary(k))
          rows.foreach(r => summary.add(r._3, 1L))
          state.update(graft.functions.MGSummary.toBytes(summary))
          Iterator.single((key._1, key._2,
            graft.functions.MGSummary.sortedKeys(summary).toSeq))
        })
      .toDF("hour_sec", "shard", "candidates")
  }
}
