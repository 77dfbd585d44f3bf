package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import scala.collection.immutable.ListMap

/** Training-data-pipeline operators over the `documents` / `embeddings` /
  * `events` tables: deduplication (exact, fingerprint, MinHash+LSH banding,
  * SimHash), similarity search (brute-force cosine top-k, all-pairs
  * near-dup), text analysis (token stats, language guess, token histogram),
  * and event-stream analytics (windowed aggregation, sessionization).
  *
  * Every operator is expressed so DuckDB can replay it exactly:
  * MinHash uses md5 as the hash family (lexicographic MIN over hex digests
  * is a valid min-hash), shingles are word 3-grams, and cosine similarity
  * is a sequential left-fold over doubles in both engines (bit-identical).
  *
  * Scale notes (100 TB thinking):
  *   - LSH candidate generation is an equi-join on (band, key) — shuffles
  *     only signature tuples, never full pairwise;
  *   - exact Jaccard runs only on the LSH candidate set;
  *   - brute-force cosine exists as the small-side baseline; the scaled
  *     path buckets by hyperplane LSH (see graft.functions).
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** seq_pack's bucket-count target: ~8 buckets per core keeps each
    * per-bucket cumsum window small while the bucket-total relation
    * (the ONE unpartitioned window in the two-phase cumsum) stays
    * O(cores) at any corpus size. Public so the plan spec can assert
    * the offset-relation bound against the same figure.
    */
  def seqPackTargetBuckets(s: SparkSession): Int =
    s.sparkContext.defaultParallelism * 8

  // ---- shared text plumbing (word 3-gram shingles + md5 minhash) ----

  private def words(c: Column): Column = split(lower(c), " ")

  /** Distinct word-3-gram shingles; short docs fall back to one shingle.
    * Single-pass expression — the composable transform(sequence...) form
    * re-evaluates split() inside the lambda, O(words^2) per doc.
    */
  private def shingles(w: Column): Column =
    graft.functions.WordShingles.word_shingles(w, 3)

  /** Word-5-gram shingles (decontamination granularity). */
  private def shingles5(w: Column): Column =
    graft.functions.WordShingles.word_shingles(w, 5)

  /** Exact-substring duplication (Lee et al. 2021, arXiv:2107.06499):
    * documents sharing long verbatim character runs surface by joining
    * their 30-char gram posting lists and counting shared grams per
    * pair. Grams present in more than 8 documents are dropped BEFORE
    * the pair join — the standard ubiquitous-boilerplate guard, and
    * the skew bound: with df <= 8 one gram contributes <= 28 pairs,
    * so no posting list can go quadratic.
    *
    * ONE corpus pass, ONE posting shuffle: CharWindows emits each
    * document's windows per-doc-distinct in a single byte scan, so the
    * ubiquity df is a plain window count over one gram exchange, the
    * df∈[2,8] filter runs before anything collects, and pairs expand
    * map-side (<= C(8,2) per gram) into the final pair aggregate — the
    * distinct + df count + semi-join form paid three shuffles for the
    * same rows. State note: the count window BUFFERS (and past the
    * spill threshold, spills) each gram's partition group — rows, not
    * unbounded memory; the O(cap) alternative remains
    * [[graft.functions.CappedDistinctLongs]], which this query used
    * through round 13 but whose ObjectHashAggregate falls out of
    * whole-stage codegen and sort-degrades past 128 keys per
    * partition (measured slower — see the body comments).
    *
    * `hashedGrams = true` is the SCALE variant: the posting shuffle is
    * keyed by xxhash64(gram) (8 bytes) instead of the raw 30-byte gram
    * — a ~2-3x shuffle-byte reduction at 100 TB (NgramProbe records
    * the measured bytes for both shapes). Output is identical unless
    * two distinct grams of one document pair collide in 64 bits
    * (~2^-64 per pair); the ORACLE-GATED query keeps raw grams, whose
    * DuckDB join is bit-exact with zero collision caveat — hashing
    * buys a constant, not a complexity class, which is why it is a
    * flag and not the default.
    */
  def ngramDupSpans(documents: DataFrame, hashedGrams: Boolean): DataFrame = {
    val docs = documents.filter(length(col("text")) >= 30)
    // one map-side pass: CharWindows emits every 30-char window of the
    // document ALREADY per-doc-distinct in a single byte scan (the
    // composable transform(sequence(...), i -> substring(text, i, 30))
    // form pays an O(chars²) UTF8String re-scan per position plus an
    // interpreted lambda dispatch per window — measured 2.4 s of the
    // query's 7.4 s at sf0.1). Per-doc distinct windows make
    // (gram, doc_id) globally unique without any aggregate, so the
    // ubiquity count df is a plain window count and the capped
    // typed-imperative aggregate — whose ObjectHashAggregate falls
    // back to sort-based aggregation past 128 keys and cost a further
    // ~2.7 s in buffer serialization over a codegen aggregate — is not
    // needed at all.
    val wins = graft.functions.CharWindows.char_windows(col("text"), 30)
    val keys =
      if (hashedGrams)
        // hash THEN re-distinct: two distinct windows colliding in 64
        // bits (2^-64) must not double-count their doc in df
        array_distinct(transform(wins, w => xxhash64(w)))
      else wins
    val grams = docs.select(col("doc_id"), explode(keys).as("gram"))
    // ONE corpus-sized exchange (hashpartitioning(gram), the same
    // posting shuffle as before): the window counts each gram's doc
    // frequency with bounded state, the ubiquity+pair filter keeps
    // df in [2, 8], and the self-join is gram-partition-local —
    // ReuseExchange serves both sides from the single shuffle, the
    // window's sort order feeds the SortMergeJoin, and with df <= 8
    // one gram contributes <= C(8,2) = 28 pairs, so no posting list
    // can go quadratic (the same skew bound as before).
    // ONE pass over that exchange, no join: the df count filters
    // FIRST (count-only window — note WindowExec still BUFFERS each
    // gram's whole partition group, spilling past
    // spark.sql.windowExec.buffer.spill.threshold, so a
    // million-doc gram costs buffered/spilled rows here, not unbounded
    // memory), and only the surviving df∈[2,8] rows — at most 8
    // per gram — reach the list-collecting window, whose sort and
    // partitioning the filter preserved, so no second exchange or
    // sort. One row per gram then expands its ≤C(8,2)=28 pairs
    // map-side (the same skew bound as ever). A self-join formulation
    // measured slower: ReuseExchange shares the shuffle but each join
    // side re-runs the sort+window over the full posting stream.
    val wf = Window.partitionBy("gram").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wo = Window.partitionBy("gram").orderBy("doc_id")
    grams
      .withColumn("df", count(lit(1)).over(wf))
      .filter(col("df").between(2, 8))
      .withColumn("ids", collect_list(col("doc_id")).over(wf))
      .withColumn("rn", row_number().over(wo))
      .filter(col("rn") === 1)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(" +
          "slice(ids, i + 2, size(ids)), y -> struct(x, y))))")).as("p"))
      .groupBy(col("p.x").as("a_id"), col("p.y").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 20)
  }

  /** MinHash_j = lexicographic min over the j-th 8-hex-char slice of
    * md5(shingle) — one digest per shingle yields all four families
    * (graft.functions.MinHashMd5 computes exactly the composable
    * `array_min(transform(sh, s -> substr(md5(s), 8*j+1, 8)))` values).
    */
  private def sigDF(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), shingles(words(col("text"))).as("sh"))
      .select(col("doc_id"), col("sh"),
        graft.functions.MinHashMd5.minhash_md5(col("sh"), 4).as("sigs"))
      .select(Seq(col("doc_id"), col("sh")) ++
        (0 until 4).map(j => element_at(col("sigs"), j + 1).as(s"sig$j")): _*)

  private val sigSqlCte =
    """tok AS (SELECT doc_id, text, string_split(lower(text), ' ') AS w
      |  FROM documents),
      |shg AS (SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(w)-2, 1)),
      |    i -> array_to_string(w[i:i+2], ' '))) AS sh FROM tok),
      |hsh AS (SELECT doc_id, sh,
      |  list_transform(sh, s -> md5(s)) AS hl FROM shg),
      |sig AS (SELECT doc_id, sh,
      |  list_aggregate(list_transform(hl, h -> substr(h,  1, 8)), 'min') AS sig0,
      |  list_aggregate(list_transform(hl, h -> substr(h,  9, 8)), 'min') AS sig1,
      |  list_aggregate(list_transform(hl, h -> substr(h, 17, 8)), 'min') AS sig2,
      |  list_aggregate(list_transform(hl, h -> substr(h, 25, 8)), 'min') AS sig3
      |  FROM hsh)""".stripMargin

  /** [[sigDF]] staged once per corpus (the "signatures table" a
    * production dedup pipeline materializes): shingles + minhash
    * signatures are md5-deterministic strings, so parquet round-trips
    * them exactly and every consumer (banding, Jaccard verify,
    * containment verify, clustering) reads identical rows instead of
    * re-hashing the corpus.
    */
  private def stagedSigs(s: SparkSession, d: String): DataFrame =
    staged(s, d, "sigs")(sigDF(s, d))

  /** doc_id + 2 band keys (2 hashes per band) for LSH bucketing. */
  private def bandsDF(s: SparkSession, d: String): DataFrame =
    stagedSigs(s, d).select(col("doc_id"),
      explode(array(
        struct(lit(0).as("band"), concat(col("sig0"), col("sig1")).as("key")),
        struct(lit(1).as("band"), concat(col("sig2"), col("sig3")).as("key"))))
        .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      // identical shuffle on both sides of the self-join -> ReuseExchange
      // computes the (expensive) signature subplan once, not twice
      .repartition(col("band"), col("key"))

  /** The distinct LSH candidate pair list (doc_a, doc_b), staged once
    * per corpus — the "candidate edges" table. Two longs per pair, so
    * the staged footprint stays linear in the candidate count (never
    * the decorated pair space).
    */
  private def stagedCandPairs(s: SparkSession, d: String): DataFrame =
    staged(s, d, "cand")(candPairsBuild(s, d))

  /** The events table z-ordered on (user_id, value) into 16 files,
    * staged once per JVM (ts is dropped: its parquet encoding varies
    * by testdata generation and the 2-D pruning story doesn't need
    * it). Layout only — row content equals the source projection.
    */
  private[graft] def stagedZOrderEvents(s: SparkSession,
      d: String): DataFrame =
    Tables.readParquet(s, stagedPath(s, d, "zorder") { p =>
      graft.operators.ZOrder.writeZOrdered(
        Tables.events(s, d)
          .select("event_id", "user_id", "event_type", "value"),
        "user_id", "value", p, 16)
    })

  /** The same events relation laid out by the EQUI-DEPTH z-order
    * writer — rank-normalized codes, the skew-robust variant.
    */
  private[graft] def stagedZOrderEventsEq(s: SparkSession,
      d: String): DataFrame =
    Tables.readParquet(s, stagedPath(s, d, "zordereq") { p =>
      graft.operators.ZOrder.writeZOrderedEquiDepth(
        Tables.events(s, d)
          .select("event_id", "user_id", "event_type", "value"),
        "user_id", "value", p, 16)
    })

  /** The banded-self-join candidate build (exposed for the plan pin:
    * the staged read hides the exchange-reuse shape being asserted).
    */
  private[queries] def candPairsBuild(s: SparkSession, d: String): DataFrame = {
    val b = bandsDF(s, d)
    b.as("a").join(b.as("b"), Seq("band", "key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH candidate pairs decorated with both docs' shingle sets —
    * the shared front half of every exact-verification pass
    * (Jaccard, containment). Never materializes the pair space:
    * candidates come from the banded equi-join; the decoration joins
    * run per consumer over the two staged linear-size tables.
    */
  private def candidateShingles(s: SparkSession, d: String): DataFrame = {
    val sh = stagedSigs(s, d).select("doc_id", "sh")
    stagedCandPairs(s, d)
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")), "doc_b")
  }

  /** LSH candidates -> exact shingle-Jaccard >= 0.4 verified pairs
    * (shared by neardup_jaccard and dedup_clusters). */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val inter = size(array_intersect(col("sa"), col("sb")))
    val jac = inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter)
    candidateShingles(s, d)
      .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= 0.4)
  }

  /** The verified near-dup edge set materialized once per JVM — the
    * production shape (one verification job writes the edge list, the
    * graph consumers read it). Shared by `pagerank_neardup` and
    * `label_propagation`, which each iterate OVER the graph and
    * shouldn't re-pay LSH + exact Jaccard per evaluation;
    * `neardup_jaccard` keeps computing live — its gate IS the
    * verification.
    */
  private def stagedJaccardEdges(s: SparkSession, d: String): DataFrame =
    staged(s, d, "jacedges") {
      jaccardPairs(s, d).select("doc_a", "doc_b")
    }

  /** The image fingerprint corpus (media_id, w, h, dhash): every third
    * document contributes its ppmFixtureLarge raster (media_id =
    * 2·doc_id) AND the re-encoded sibling (media_id = 2·doc_id + 1) —
    * real P6 byte decode, nearest 9x8 downsample, full 64-bit dHash.
    * Map-side only; at 100 TB the decode parallelism is the row
    * partitioning and each image contributes one 64-bit signature.
    */
  private def dhashMedia(s: SparkSession, d: String): DataFrame = {
    val ppm = udf((id: Long, v: Int) =>
      if (v == 0) graft.multimodal.Multimodal.ppmFixtureLarge(id)
      else graft.multimodal.Multimodal.ppmFixtureLargeReenc(id))
    val dh = udf((bytes: Array[Byte]) => {
      val img = graft.multimodal.Multimodal.decodePpm(bytes)
      (img.width, img.height, graft.multimodal.Multimodal.dHash9x8(img))
    })
    Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), explode(array(lit(0), lit(1))).as("v"))
      .select((col("doc_id") * 2 + col("v")).as("media_id"),
        dh(ppm(col("doc_id"), col("v"))).as("r"))
      .select(col("media_id"), col("r._1").as("w"), col("r._2").as("h"),
        col("r._3").as("dhash"))
  }

  /** Banded hamming self-join over 64-bit dHash signatures: 4 disjoint
    * 16-bit bands, equi-join on (band, key), exact hamming <= 3 as the
    * residual — the pigeonhole guarantees completeness (4 bands, <= 3
    * differing bits => some band identical). Shuffles signature tuples
    * only; the repartition on (band, key) makes both self-join inputs
    * the same exchange -> ReuseExchange computes the signatures once.
    */
  private def dhashBandedPairs(sig: DataFrame): DataFrame = {
    def key(c: Column, p: Int): Column =
      shiftright(c, 16 * p).bitwiseAND(lit(0xffffL))
    val banded = sig
      .select(col("media_id"), col("dhash"),
        posexplode(array((0 until 4).map(p => key(col("dhash"), p)): _*))
          .as(Seq("band", "key")))
      .repartition(col("band"), col("key"))
    // first-matching-band dedup — see simhash_pairs: each qualifying
    // pair is emitted exactly once (at the smallest band both agree
    // on, a row-local test over the carried signatures), so the final
    // pair-space DISTINCT exchange is gone while the pair set is
    // provably unchanged.
    val firstBand = (0 until 3).foldRight(lit(3): Column)((p, rest) =>
      when(key(col("a.dhash"), p) === key(col("b.dhash"), p), p)
        .otherwise(rest))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id") &&
          col("a.band") === firstBand)
      .select(col("a.media_id").as("media_a"),
        col("b.media_id").as("media_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
  }

  /** The verified image near-dup edge set, staged once per JVM — the
    * [[stagedJaccardEdges]] discipline for images: the live compute
    * stays `image_dhash_pairs`' gate, graph consumers read the staged
    * table.
    */
  private def stagedDhashPairs(s: SparkSession, d: String): DataFrame =
    staged(s, d, "dhpairs") {
      dhashBandedPairs(dhashMedia(s, d)).select("media_a", "media_b")
    }

  /** The image components staged once per JVM — the [[stagedClusters]]
    * discipline: the iterative min-label loop runs in ONE job chain
    * and its consumers read the materialized (id, cluster) table
    * (nested staged build: pairs stage inside the cluster stage,
    * reentrant on the stage-registry monitor). The oracle still
    * replays the whole chain relationally, so the gate is unchanged.
    */
  private def stagedDhashClusters(s: SparkSession, d: String): DataFrame =
    staged(s, d, "dhcc") {
      graft.operators.GraphOps.connectedComponents(
        stagedDhashPairs(s, d), "media_a", "media_b")
        .select(col("id").cast("long").as("id"),
          col("cluster").cast("long").as("cluster"))
    }

  /** Stage `build`'s result to scratch parquet once per (application,
    * corpus dir, name); every later call reads the staged table. Two
    * jobs: (a) expensive intermediates shared by several queries are
    * paid once — the shape a production pipeline ships anyway (a
    * materialized table written by one job, read by its consumers);
    * (b) repeated evaluations in a long-lived driver stop accumulating
    * one scratch tree per invocation (one per corpus instead).
    * A reentrant monitor serializes concurrent first use — reentrant
    * because one staged build may consume another staged table (cand
    * pairs read the sigs table), which ConcurrentHashMap.computeIfAbsent
    * forbids. Staged results are deterministic, so every consumer reads
    * identical rows.
    */
  private val stageRegistry =
    scala.collection.mutable.HashMap.empty[String, String]

  /** Driver-object twin of [[stagedPath]]: a small derived structure
    * (e.g. a bloom filter over a release's fingerprints) built once
    * per (session, corpus) and reused across query builds — the same
    * built-once-per-release contract the staged index directories
    * already follow, for artifacts that live on the driver instead of
    * on disk. Results never change: every consumer uses these as
    * pre-filters whose false positives are weeded by an exact join.
    */
  private val objRegistry =
    scala.collection.mutable.HashMap.empty[String, Any]

  private def stagedObj[T](s: SparkSession, d: String, name: String)(
      build: => T): T = {
    // sessionUUID, not identityHashCode: the hash can collide between
    // two live sessions, which would hand one session an object built
    // under another's confs (same fix as Tables.relCache)
    val key = s.sparkContext.applicationId + "|" +
      org.apache.spark.sql.graftinterop.ColumnInterop.sessionUUID(s) +
      "|" + d + "|" + name
    objRegistry.synchronized {
      objRegistry.getOrElseUpdate(key, build).asInstanceOf[T]
    }
  }

  /** The path form of [[staged]], for builds that need control over the
    * write (e.g. `partitionBy` index materializations): `build` writes
    * whatever layout it wants at the path it is handed; later calls get
    * the same committed path back without rebuilding.
    */
  private def stagedPath(s: SparkSession, d: String, name: String)(
      build: String => Unit): String = {
    val key = s.sparkContext.applicationId + "|" + d + "|" + name
    stageRegistry.synchronized {
      stageRegistry.get(key) match {
        case Some(p) => p
        case None =>
          val p = QueryTmp.dir(s"graft_$name") + "/" + name
          build(p)
          stageRegistry.put(key, p)
          p
      }
    }
  }

  private def staged(s: SparkSession, d: String, name: String)(
      build: => DataFrame): DataFrame =
    // staged paths are write-once per JVM (the registry serializes the
    // build), so the resolved relation is memoizable like a base table
    Tables.readParquet(s, stagedPath(s, d, name)(p => build.write.parquet(p)))

  /** The jaccardPairs -> connected-components labelling, staged once
    * and shared by `dedup_clusters` and `dedup_keep_best` — the two
    * slowest bench queries when each re-ran the full iterative
    * pipeline independently.
    */
  private def stagedClusters(s: SparkSession, d: String): DataFrame =
    staged(s, d, "cc") {
      graft.operators.GraphOps
        .connectedComponents(jaccardPairs(s, d), "doc_a", "doc_b")
        .select(col("id").cast("long").as("doc_id"),
          col("cluster").cast("long").as("cluster"))
    }

  /** The k=4 / 1-Lloyd-iteration assignment over the embeddings
    * (id, v, cluster, dist2), staged once and shared by kmeans_embed,
    * semdedup, and ann_ivf_kmeans — all three train the SAME codebook.
    * Doubles round-trip parquet exactly, so the oracles are unchanged.
    */
  private def stagedKmeansAssign(s: SparkSession, d: String): DataFrame =
    staged(s, d, "km4") {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"), toDouble(col("embedding")).as("v"))
      graft.operators.KMeans.assign(e,
        graft.operators.KMeans.centroids(e, "id", "v", 4, 1))
    }

  /** Product-quantization codebook (sub, cid, cv) and codes
    * (id, sub, code) over the embeddings, staged once per JVM: m=2
    * subspaces of 32 dims, k=16 codes per subspace, seeded from
    * vec_id 0..15, one fixed-point Lloyd step — the [[KMeans]]
    * determinism laws fused across subspaces (see
    * [[graft.operators.SimilarityOps.pqTrain]]). Doubles round-trip
    * parquet exactly, so the staged reads gate like the direct
    * pipelines.
    */
  private def stagedPqCodebook(s: SparkSession, d: String): DataFrame =
    staged(s, d, "pqcb") {
      graft.operators.SimilarityOps.pqTrain(
        Tables.embeddings(s, d), "vec_id", "embedding", 2, 16, 64)
    }

  /** SQ8 quantizer (1 row of lo/s arrays) and codes (id, codes) over
    * the embeddings, staged once per JVM — doubles round-trip parquet
    * exactly, so the staged reads gate like the direct pipeline. The
    * codes table drops v: the persisted-index form is codes alone.
    */
  private def stagedSq8Stats(s: SparkSession, d: String): DataFrame =
    staged(s, d, "sq8st") {
      graft.operators.SimilarityOps.sq8Train(
        Tables.embeddings(s, d), "embedding")
    }

  private def stagedSq8Codes(s: SparkSession, d: String): DataFrame =
    staged(s, d, "sq8cd") {
      graft.operators.SimilarityOps.sq8Encode(
        Tables.embeddings(s, d), "vec_id", "embedding",
        stagedSq8Stats(s, d)).select("id", "codes")
    }

  private def stagedPqCodes(s: SparkSession, d: String): DataFrame =
    staged(s, d, "pqcodes") {
      graft.operators.SimilarityOps.pqEncode(
        Tables.embeddings(s, d), "vec_id", "embedding",
        stagedPqCodebook(s, d), 2, 64)
    }

  /** documents written into 16 content-hash-placed buckets with a
    * per-bucket doc_id bloom sidecar ([[graft.sources.FileBloomIndex]]),
    * staged once per JVM — the `bloom_point_lookup` gate measures the
    * sidecar-pruned READ. Filters are sized from the data (one count
    * job at stage time): a constant would degrade toward fpp=1 once
    * the corpus outgrows it — the dedup_incremental_bloom lesson.
    */
  private[queries] def stagedBloomIndex(s: SparkSession, d: String): String =
    stagedPath(s, d, "fbloom") { p =>
      val docs = Tables.documents(s, d)
      val perBucket = math.max(docs.count() / 16, 64L)
      graft.sources.FileBloomIndex.write(
        docs, "doc_id", pmod(hash(col("text")), lit(16)), p, perBucket)
    }

  // ---- embeddings plumbing ----

  private def toDouble(c: Column): Column = transform(c, _.cast(DoubleType))

  /** Codegen'd sequential dot product — bit-identical to the
    * `aggregate(zip_with(...))` left fold and to DuckDB's
    * `list_aggregate('sum')`, but ~20x faster (no lambda interpretation).
    */
  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.dot_f64(a, b)

  /** Composite quality score; dyadic weights keep every intermediate
    * double bit-identical across engines (see quality_score oracle).
    */
  private def qualityExpr(t: Column): Column = {
    val nTokens = length(t) - length(regexp_replace(t, " ", "")) + 1
    val avgLen = (length(regexp_replace(t, " ", "")).cast("double") /
      nTokens.cast("double"))
    val padded = concat(lit(" "), t, lit(" "))
    val nThe = (length(padded) - length(regexp_replace(padded, " the ", " "))) / 4
    least(nTokens.cast("double") / 100.0, lit(1.0)) * 0.5 +
      least(avgLen / 8.0, lit(1.0)) * 0.25 +
      when(nThe > 0, 1.0).otherwise(0.0) * 0.25
  }

  /** 16-bit token-frequency-weighted SimHash per document (bits voted
    * from md5 hex nibbles) — the `simhash` signature query. The banded
    * pair search uses the separate 60-bit [[graft.functions.SimHash64]]
    * (16 bits are degenerate for near-dup search on a shared-vocab
    * corpus — see simhash_pairs).
    */
  private def simhashDf(s: SparkSession, d: String): DataFrame =
    // one-pass SimHash16 expression — identical votes/bits to the
    // 16 composable aggregate() folds it replaces (see SimHash16's
    // scaladoc for the law and the measured interpreted-HOF cost)
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.SimHash16.simhash16(words(col("text")))
          .as("simhash"))

  /** The is-it-English hashed feature matrix (id, y, f, x) the binary
    * perceptron gates train/evaluate on — a row-local projection of
    * the staged multiclass matrix (y = ±1 from cls; the label is
    * constant per id, so the counts are identical — see
    * [[perceptronFeatsMc]] and [[perceptronFeatCte]] for the SQL twin).
    */
  private def perceptronFeats(s: SparkSession, d: String): DataFrame =
    perceptronFeatsMc(s, d)
      .select(col("id"),
        when(col("cls") === "en", 1L).otherwise(-1L).as("y"),
        col("f"), col("x"))

  /** The multiclass (id, cls, f, x) feature matrix, staged once per
    * corpus like sigs/tf — the table a production training pipeline
    * materializes before fitting anything. SHARED by all three
    * classifier gates: perceptron_ovr_confusion reads it directly,
    * and the binary matrix is a projection (y = ±1 from cls — the
    * label is constant per id, so grouping by (id, y, f) equals
    * grouping by (id, cls, f)). Integer counts round-trip parquet
    * exactly, so every consumer and oracle is unchanged.
    */
  private def perceptronFeatsMc(s: SparkSession, d: String): DataFrame =
    staged(s, d, "percfeat") {
      Tables.documents(s, d)
        .select(col("doc_id").as("id"), col("lang").as("cls"),
          explode(words(col("text"))).as("token"))
        .select(col("id"), col("cls"),
          conv(substring(md5(col("token").cast("binary")), 1, 1), 16, 10)
            .cast("int").as("f"))
        .groupBy("id", "cls", "f").agg(count(lit(1)).as("x"))
    }

  /** DuckDB twin of [[perceptronFeats]]: split on ' ', first md5
    * nibble, frequency counts.
    */
  /** DuckDB twin of [[perceptronFeatsMc]]. */
  private val perceptronFeatMcCte: String =
    """feat AS (
      |  SELECT doc_id AS id, lang AS cls,
      |  CAST(strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1
      |    AS INTEGER) AS f,
      |  CAST(COUNT(*) AS BIGINT) AS x
      |  FROM (SELECT doc_id, lang,
      |        unnest(string_split(lower(text), ' ')) AS token
      |        FROM documents) t
      |  GROUP BY 1, 2, 3)""".stripMargin

  private val perceptronFeatCte: String =
    """feat AS (
      |  SELECT doc_id AS id,
      |  CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
      |  CAST(strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1
      |    AS INTEGER) AS f,
      |  CAST(COUNT(*) AS BIGINT) AS x
      |  FROM (SELECT doc_id, lang,
      |        unnest(string_split(lower(text), ' ')) AS token
      |        FROM documents) t
      |  GROUP BY 1, 2, 3)""".stripMargin

  val queries: ListMap[String, Q] = ListMap(
    // exact dedup: group by content hash, keep lowest doc_id
    "dedup_exact" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))),

    // fingerprint dedup: md5 over the sorted distinct word set
    // (order/whitespace-insensitive duplicate detection); single-pass
    // expression — see WordSetFingerprint scaladoc for why not the
    // composable md5(concat_ws(array_sort(array_distinct(...)))) form
    "dedup_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(graft.functions.WordSetFingerprint
          .word_set_fingerprint(col("text")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))),

    // paragraph-level exact dedup (the C4/RefinedWeb within-corpus
    // transform): each document splits into fixed 10-token blocks
    // map-side, every block competes GLOBALLY for its content hash
    // (winner = first occurrence by (doc_id, block)), losers are
    // removed and the surviving blocks re-assemble the document. 100 TB
    // shape: ONE corpus scan — the winner per hash is taken with a
    // map-side-combinable min_by (the combiner holds one candidate row
    // per distinct hash, exactly like any min), so there is no second
    // scan and no join back — then one doc_id re-assembly shuffle
    // bounded by document size. No windows, no global sort, no pair
    // blowup. rk = doc_id*1e6 + block is a total order == (doc_id,
    // block) lexicographic while docs stay under 10M tokens.
    "para_dedup" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nblk = ceil(size(toks) / lit(10.0)).cast("int")
      val blocks = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), nblk - 1),
            b => array_join(slice(toks, b * 10 + 1, lit(10)), " ")))
            .as(Seq("b", "para")))
      blocks
        .groupBy(md5(col("para").cast("binary")).as("h"))
        .agg(min_by(struct(col("doc_id"), col("b"), col("para")),
          col("doc_id") * 1000000L + col("b")).as("w"))
        .groupBy(col("w.doc_id").as("doc_id"))
        .agg(array_join(
            transform(array_sort(collect_list(struct(col("w.b"), col("w.para")))),
              x => x.getField("para")), " ").as("clean_text"),
          count(lit(1)).as("n_kept"))
    }),

    // WITHIN-document repetition removal (the Gopher/C4 per-doc
    // transform, complementing para_dedup's global competition): keep
    // the first occurrence of each 10-token block inside its own
    // document. Entirely higher-order array functions — no explode,
    // no shuffle, ZERO exchanges (pinned in SkewSaltParaDedupSpec):
    // the per-row filter is O(blocks²) with blocks bounded by
    // document length, the canonical "row-local transform stays
    // row-local" shape at any corpus size.
    "dedup_within_doc" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nblk = ceil(size(toks) / lit(10.0)).cast("int")
      val blocks = transform(sequence(lit(0), nblk - 1),
        b => array_join(slice(toks, b * 10 + 1, lit(10)), " "))
      // first-occurrence-order distinct IS array_distinct: the former
      // filter(blocks, (x, i) -> array_position(blocks, x) == i + 1)
      // re-scanned the (interpreted-HOF) blocks array per element —
      // O(blocks²) with the blocks expression re-evaluated inside its
      // own lambda; array_distinct is one hash pass over one
      // evaluation, identical kept set and order
      Tables.documents(s, d)
        .select(col("doc_id"), array_distinct(blocks).as("kept"))
        .select(col("doc_id"), array_join(col("kept"), " ").as("clean_text"),
          size(col("kept")).cast("long").as("n_kept"))
    }),

    // per-doc MinHash signature (4 hashes over word-3-gram shingles)
    "minhash_signature" -> ((s, d) =>
      sigDF(s, d).select("doc_id", "sig0", "sig1", "sig2", "sig3")),

    // LSH banding: candidate near-dup pairs = equi-join on band keys.
    // This is the 100TB-scalable shape: shuffle signatures, not pairs.
    "lsh_candidate_pairs" -> ((s, d) => stagedCandPairs(s, d)),

    // exact n-gram Jaccard verification over the LSH candidate set only
    "neardup_jaccard" -> ((s, d) => jaccardPairs(s, d)),

    // ASYMMETRIC containment (|A∩B| / |A|, and /|B|) over the same LSH
    // candidates: catches a short document embedded inside a long one
    // (quotes, boilerplate wrappers) that symmetric Jaccard dilutes
    // below any threshold. Integer-ratio scores -> exact on both
    // engines; same banded shuffle shape as neardup_jaccard.
    "minhash_containment" -> ((s, d) => {
      val inter = size(array_intersect(col("sa"), col("sb")))
      candidateShingles(s, d)
        .select(col("doc_a"), col("doc_b"),
          (inter.cast("double") / size(col("sa"))).as("cont_a"),
          (inter.cast("double") / size(col("sb"))).as("cont_b"))
        .filter(greatest(col("cont_a"), col("cont_b")) >= 0.5)
    }),

    // pairs -> GROUPS: connected components over the verified near-dup
    // graph (min-id label propagation, one shuffle per round — see
    // GraphOps.connectedComponents). The canonical-representative step
    // every dedup pipeline needs between "found near-dups" and "kept
    // one copy per cluster". Oracle replays it as a recursive CTE.
    "dedup_clusters" -> ((s, d) => stagedClusters(s, d)),

    // PageRank over the verified near-dup graph (3 rounds, exact
    // integer micro-units): centrality for dedup review — the anchor
    // document of each near-dup neighbourhood scores highest. The
    // integer law (contrib = pr div deg; damping = one multiply + one
    // integer divide) makes every round's ranks order-free longs, so
    // the unrolled relational replay hash-matches — no floating-point
    // summation-order hazard. One shuffle per round at any scale.
    "pagerank_neardup" -> ((s, d) => {
      val pairs = stagedJaccardEdges(s, d)
      val sym = pairs.unionAll(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      graft.operators.GraphOps.pageRankInt(sym, "doc_a", "doc_b", 3)
        .select(col("id").cast("long").as("doc_id"), col("pr"))
    }),

    // SimHash (16-bit, from md5 hex nibbles, token-frequency weighted)
    "simhash" -> ((s, d) => simhashDf(s, d)),

    // SimHash near-dup pairs with an EXACT banding guarantee: 3
    // differing bits can touch at most 3 of the 4 disjoint 15-bit
    // bands of the 60-bit signature ([[functions.SimHash64]] — wide
    // enough that only true near-dups land at hamming <= 3), so every
    // qualifying pair shares a band — the banded equi-join + verify
    // returns exactly the brute-force answer (the oracle IS the O(n^2)
    // brute force) while only ever shuffling (doc_id, band, key)
    // tuples, never the pair space. repartition on (band, key) makes
    // both self-join inputs the same exchange -> ReuseExchange
    // computes the signatures once.
    "simhash_pairs" -> ((s, d) => {
      val sig = Tables.documents(s, d).select(col("doc_id"),
        graft.functions.SimHash64.simhash64(words(col("text")))
          .as("simhash"))
      def key(c: Column, p: Int): Column =
        shiftright(c, 15 * p).bitwiseAND(lit(0x7fffL))
      val banded = sig
        .select(col("doc_id"), col("simhash"),
          posexplode(array((0 until 4).map(p => key(col("simhash"), p)): _*))
            .as(Seq("band", "key")))
        .repartition(col("band"), col("key"))
      // FIRST-matching-band dedup (r15): a pair sharing k bands used to
      // be emitted k times and deduped by a final pair-space DISTINCT
      // exchange. Both join sides carry the full signature, so "is this
      // the first band the pair agrees on" is a row-local residual —
      // each qualifying pair now surfaces exactly once and the DISTINCT
      // shuffle (over the PAIR space, the one table here that can
      // outgrow the signature table) disappears. Same pair set: every
      // pair with >= 1 shared band has exactly one first shared band.
      val firstBand = (0 until 3).foldRight(lit(3): Column)((p, rest) =>
        when(key(col("a.simhash"), p) === key(col("b.simhash"), p), p)
          .otherwise(rest))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("a.band") === firstBand)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
    }),

    // brute-force cosine top-k against a probe vector (ANN baseline)
    "ann_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val probe = e.filter(col("vec_id") === 0)
        .select(toDouble(col("embedding")).as("pe"))
      val cand = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"), toDouble(col("embedding")).as("ce"))
      cand.crossJoin(broadcast(probe))
        .select(col("vec_id"),
          (dot(col("ce"), col("pe")) /
            (sqrt(dot(col("ce"), col("ce"))) *
              sqrt(dot(col("pe"), col("pe")))))
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(10)
    }),

    // embedding near-duplicates: EXACT all-pairs cosine >= 0.45 in the
    // block-partitioned all-pairs shape — hash equi-joins on block-pair
    // keys, bounded task memory, no cartesian nested loop. LSH
    // (SimilarityOps.nearDupPairsLSH) remains the approximate path for
    // the tight-threshold (>= ~0.9) production regime; at 0.45 on this
    // corpus its candidate set exceeds the full pair space (see
    // nearDupPairsBlocked scaladoc for the measurements).
    "embed_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      graft.operators.SimilarityOps
        .nearDupPairsBlocked(e, "vec_id", "v", 0.45, 8)
        .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"),
          col("cosine"))
    }),

    // IVF-style two-stage ANN (the scale path for similarity search):
    // broadcast codebook -> map-side argmax assignment -> exact top-k
    // over the probe's cell only. Centroids = vec_ids 0..7, probe = 8.
    "ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      graft.operators.SimilarityOps.annIvf(e, "vec_id", "v", 8, 8L, 10)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // multi-probe IVF: the recall dial — the probe scores exactly
    // against the UNION of its 3 nearest cells (nprobe=3 of 8), so
    // neighbors that fell just across the probe's own cell boundary
    // come back. Still broadcast-pruned: ~nprobe/nCentroids of the
    // data is touched.
    "ann_ivf_multiprobe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      graft.operators.SimilarityOps
        .annIvfMultiProbe(e, "vec_id", "v", 8, 8L, 10, 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // BATCH multi-probe: three probes answered in ONE pipeline — cells
    // rank per probe through GroupedTopK, candidates form via one
    // bucket equi-join against the broadcast (probe, cell) list,
    // per-probe exact top-5 again through GroupedTopK. The workload
    // shape: many probes, no per-probe jobs.
    "ann_ivf_batch" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      graft.operators.SimilarityOps
        .annIvfMultiProbeBatch(e, "vec_id", "v", 8, Seq(8L, 9L, 10L),
          k = 5, nprobe = 2)
        .select(col("pid").as("probe_id"), col("id").as("vec_id"),
          col("cosine"))
    }),

    // the repeated-query production shape of ann_ivf: assignment
    // materialized partitionBy(bucket) ONCE per corpus (the staged-path
    // registry serializes concurrent first builds), so the probe-cell
    // filter is directory-level partition pruning at the parquet scan
    // (asserted in PipelinePlanSpec) and repeated probes pay only the
    // pruned read. Same answer as ann_ivf by construction.
    "ann_ivf_bucketed" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfidx") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
      }
      graft.operators.SimilarityOps.annIvfFromIndex(s, dir, 8L, 10)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // multi-probe over the SAME bucketed index: the probe's 3 nearest
    // cells rank driver-side against the index's _codebook sidecar and
    // the scan filter is `bucket IN (...)` — partition pruning over 3
    // directories instead of 1, repeated-query economics intact. Same
    // answer as the one-shot ann_ivf_multiprobe by construction.
    "ann_ivf_bucketed_multiprobe" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfidx") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexMultiProbe(s, dir, 8L, 10, nprobe = 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // INCREMENTAL index ingest — the daily-batch shape
    // (dedup_incremental's ANN counterpart): the index is built over
    // the corpus's first slice, the remainder arrives later through
    // appendToIvfIndex, which quantizes ONLY the new rows against the
    // stored immutable _codebook and appends bucket files (untouched
    // files byte-identical, pinned in AnnIndexSpec). Because build and
    // append share one scoring rule, the appended index row-for-row
    // equals a full rebuild over the union — so the probe's oracle is
    // the one-shot multi-probe oracle, and the hash gate proves the
    // incremental path loses nothing.
    "ann_ivf_incremental" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfinc") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(
          e.filter(col("vec_id") < 32), "vec_id", "v", 8, p)
        graft.operators.SimilarityOps.appendToIvfIndex(
          e.filter(col("vec_id") >= 32), "vec_id", "v", p)
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexMultiProbe(s, dir, 8L, 10, nprobe = 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // full index LIFECYCLE gate: build on the first slice, append the
    // rest in two batches (O(batch) each), COMPACT the fragmented
    // bucket directories (dynamic partition overwrite, content
    // preserved row-for-row), then probe — the answer must equal the
    // one-shot multi-probe over the whole corpus, which is exactly
    // what the shared oracle hash-checks.
    "ann_ivf_compacted" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfcmp") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(
          e.filter(col("vec_id") < 32), "vec_id", "v", 8, p)
        graft.operators.SimilarityOps.appendToIvfIndex(
          e.filter(col("vec_id") >= 32 && col("vec_id") < 64),
          "vec_id", "v", p)
        graft.operators.SimilarityOps.appendToIvfIndex(
          e.filter(col("vec_id") >= 64), "vec_id", "v", p)
        graft.operators.SimilarityOps.compactIvfIndex(s, p,
          maxFilesPerBucket = 1)
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexMultiProbe(s, dir, 8L, 10, nprobe = 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // TOMBSTONE delete — the third index-lifecycle verb: build over
    // the full corpus, delete ids 100..299 (a metadata-sized sidecar
    // append; no index data rewritten), probe. The probe's candidates
    // anti-join the broadcast tombstone set, so the answer equals the
    // multi-probe oracle over the corpus WITHOUT the deleted rows —
    // which is exactly what the dedicated oracle hash-checks.
    "ann_ivf_deleted" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfdel") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
        graft.operators.SimilarityOps.deleteFromIvfIndex(
          s, p, (100L until 300L))
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexMultiProbe(s, dir, 8L, 10, nprobe = 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // ...and the PURGE: same deletes, then compactIvfIndex physically
    // rewrites only the buckets holding deleted ids, removes emptied
    // bucket directories, rewrites the _ids sidecar and clears the
    // tombstones — after which probes stop paying the anti-join. Same
    // oracle as ann_ivf_deleted: purge must change no answer.
    "ann_ivf_purged" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfpur") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
        graft.operators.SimilarityOps.deleteFromIvfIndex(
          s, p, (100L until 300L))
        graft.operators.SimilarityOps.compactIvfIndex(s, p)
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexMultiProbe(s, dir, 8L, 10, nprobe = 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // RETRAIN — the codebook-drift verb (round 13): build freezes the
    // codebook (that is what makes append == rebuild provable), so a
    // drifted corpus needs retrainIvfIndex — k-means over the LIVE
    // index (seed = the 4 lowest live ids, one Lloyd round),
    // re-quantize everything with the shared scoring rule, rewrite
    // data + _codebook + _ids. The oracle is a FRESH IVF build at the
    // new codebook replayed end to end (Lloyd fixed-point means
    // included), so the hash gate proves retrain == rebuild-at-new-
    // codebook — the same equivalence law append and compact carry.
    "ann_ivf_retrained" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfret") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
        graft.operators.SimilarityOps.retrainIvfIndex(s, p, k = 4,
          iters = 1)
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexMultiProbe(s, dir, 8L, 10, nprobe = 2)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // HOT-CELL SPLIT — the incremental lever between retrains (round
    // 14): the index's largest cell(s) re-k-means locally (subK=2,
    // one Lloyd round, seeds = the 2 lowest ids IN the cell) and the
    // parent is replaced by the children in data + _codebook + _ids;
    // untouched buckets stay byte-identical (pinned in AnnIndexSpec).
    // The hot rule here — split whatever ties the MAX cell size — is
    // deterministic relational arithmetic, so the oracle replays the
    // whole verb: build assignment, hot detection, per-cell sub-
    // k-means with the micro-unit fixed-point means, deterministic
    // child renumbering (maxCid+1+i*subK+j), re-assignment, then the
    // multi-probe against the post-split codebook.
    "ann_ivf_split" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfsplit") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
        val m = s.read.parquet(p).groupBy("bucket")
          .agg(count(lit(1)).as("n")).agg(max("n"))
          .collect().head.getLong(0)
        // max(1, m-1): at m == 1 nothing can split (n > 1 never
        // trips) and the verb degenerates gracefully to no-op instead
        // of tripping its maxRowsPerBucket >= 1 require
        graft.operators.SimilarityOps.splitHotCells(s, p,
          maxRowsPerBucket = math.max(1L, m - 1), subK = 2, iters = 1)
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexMultiProbe(s, dir, 8L, 10, nprobe = 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // BATCH multi-probe against the STORED index — the nightly
    // retrieval workload: probe rows located via the _ids sidecar
    // (scan pruned to the probes' own buckets), cells ranked per probe
    // through GroupedTopK, candidates reached by a broadcast
    // (probe,cell) join the bucket-partitioned scan answers with
    // dynamic partition pruning. Bit-identical to the one-shot batch
    // (same oracle).
    "ann_ivf_index_batch" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfidx") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexBatch(s, dir, Seq(8L, 9L, 10L), k = 5, nprobe = 2)
        .select(col("pid").as("probe_id"), col("id").as("vec_id"),
          col("cosine"))
    }),

    // kNN LABELING through the stored index — retrieval-augmented
    // classification (round 13): each probe's top-5 neighbors come
    // from the bucketed IVF index (the ann_ivf_index_batch pipeline,
    // DPP-pruned scan), their labels majority-vote with ties to the
    // smallest label — exact integer votes, so the whole
    // probe->retrieve->vote chain hash-matches the relational replay.
    // The semi-supervised primitive behind auto-labeling a corpus from
    // a reviewed slice at 100 TB: probes are a batch, never a loop.
    "ann_knn_label" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfidx") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
      }
      val topk = graft.operators.SimilarityOps
        .annIvfFromIndexBatch(s, dir, Seq(8L, 9L, 10L), k = 5, nprobe = 2)
      topk.join(Tables.embeddings(s, d)
          .select(col("vec_id").as("id"), col("label")), "id")
        .groupBy(col("pid"), col("label"))
        .agg(count(lit(1)).as("votes"))
        .groupBy("pid")
        .agg(min(struct((-col("votes")).as("nv"), col("label").as("l")))
          .as("m"))
        .select(col("pid").as("probe_id"), col("m.l").as("label"),
          (-col("m.nv")).as("votes"))
    }),

    // probe-by-VECTOR over the same bucketed index — the retrieval
    // shape (query embedded at request time, not a stored row): no id
    // lookup at all, cells rank against _codebook, scan prunes to the
    // probed directories. No self-exclusion — the probe vector here is
    // vec_id 8's embedding, so that row itself comes back at cosine 1.
    "ann_ivf_vector" -> ((s, d) => {
      val dir = stagedPath(s, d, "ivfidx") { p =>
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        graft.operators.SimilarityOps.buildIvfIndex(e, "vec_id", "v", 8, p)
      }
      // the probe vector is fixture input acquisition (an external
      // query vector in production) — fetch it once per (session,
      // corpus), not one collect job per query build
      val pv = stagedObj(s, d, "probe8") {
        Tables.embeddings(s, d).filter(col("vec_id") === 8L)
          .select(toDouble(col("embedding"))).collect()(0)
          .getSeq[Double](0).toArray
      }
      graft.operators.SimilarityOps
        .annIvfFromIndexVector(s, dir, pv, 10, nprobe = 3)
        .select(col("id").as("vec_id"), col("cosine"))
    }),

    // multimodal: binary payloads -> typed features through the
    // partition-wise decode plumbing. Image rows carry REAL binary PPM
    // (P6) payloads and go through the actual byte-level parser
    // (Multimodal.decodePpm): width/height from the header, exact
    // per-channel means from the decoded raster. Audio rows carry real
    // RIFF/WAVE PCM16 bytes parsed by Multimodal.decodeWav: sample
    // rate, count, peak and RMS from the decoded samples. Pixel and
    // sample values follow closed-form laws in (doc_id, position), so
    // the oracle replays the DECODED features analytically. Video rows
    // carry real GFV1 clips (concatenated P6 frames) parsed by
    // Multimodal.decodeVideo: frame dims/count/duration plus channel
    // means over every 2nd frame (decode-time frame sampling).
    "media_features" -> ((s, d) => {
      val ppm = udf((id: Long) => graft.multimodal.Multimodal.ppmFixture(id))
      val wav = udf((id: Long) => graft.multimodal.Multimodal.wavFixture(id))
      val vid = udf((id: Long) => graft.multimodal.Multimodal.videoFixture(id))
      graft.multimodal.Multimodal.mediaFeatures(
        Tables.documents(s, d).select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind"),
          when(col("doc_id") % 3 === 0, ppm(col("doc_id")))
            .when(col("doc_id") % 3 === 1, wav(col("doc_id")))
            .otherwise(vid(col("doc_id"))).as("payload")))
    }),

    // multimodal: REAL frame sampling — every 2nd frame of each GFV1
    // clip decoded into one typed row (frame index/timestamp, dims,
    // that frame's exact channel means). One partition-wise pass,
    // no shuffle; at 100 TB the decode parallelism is the row
    // partitioning and only sampled frames' pixels are touched.
    "media_video_frames" -> ((s, d) => {
      val vid = udf((id: Long) => graft.multimodal.Multimodal.videoFixture(id))
      graft.multimodal.Multimodal.videoFrames(
        Tables.documents(s, d).filter(col("doc_id") % 3 === 2).select(
          col("doc_id").as("media_id"),
          lit("video").as("kind"),
          vid(col("doc_id")).as("payload")),
        everyK = 2)
    }),

    // multimodal: REAL image resize — decode each P6 payload, nearest
    // pixel-center resample to 6x5 (sx = ((2dx+1)w)//(2*6), integer
    // floor), re-encode as P6, then re-decode through mediaFeatures:
    // the emitted means are over the RESIZED raster, so the whole
    // decode -> resample -> encode -> decode loop is oracle-checked.
    // Partition-wise, no shuffle at any step.
    "media_resize" -> ((s, d) => {
      val ppm = udf((id: Long) => graft.multimodal.Multimodal.ppmFixture(id))
      val media = Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(
          col("doc_id").as("media_id"),
          lit("image").as("kind"),
          ppm(col("doc_id")).as("payload"),
          lit(null).cast(graft.multimodal.Multimodal.metaType).as("meta"))
      graft.multimodal.Multimodal.mediaFeatures(
        graft.multimodal.Multimodal.resize(media, 6, 5)
          .select("media_id", "kind", "payload"))
    }),

    // multimodal: perceptual image fingerprints (dHash) over the
    // DECODED rasters — the image-dedup analogue of simhash: bit
    // y*(w-1)+x records the horizontal gray gradient, so re-encoded /
    // lightly-edited copies land at hamming distance ~0 and hash
    // equality is the dedup candidate test. The engine parses the
    // actual P6 bytes; the oracle recomputes every gradient bit from
    // the fixture's analytic channel laws — exact integers end to
    // end. Map-side only; at 100 TB the decode parallelism is the row
    // partitioning and each image contributes one 64-bit hash.
    "image_dhash" -> ((s, d) => {
      val ppm = udf((id: Long) => graft.multimodal.Multimodal.ppmFixture(id))
      val dh = udf((bytes: Array[Byte]) => {
        val img = graft.multimodal.Multimodal.decodePpm(bytes)
        (img.width, img.height, graft.multimodal.Multimodal.dHash(img))
      })
      Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"), dh(ppm(col("doc_id"))).as("r"))
        .select(col("media_id"), col("r._1").as("width"),
          col("r._2").as("height"), col("r._3").as("dhash"))
    }),

    // multimodal: REAL-RESOLUTION perceptual fingerprints — the
    // production dHash (round 13): rasters larger than the canonical
    // 9x8 grid (16..22 x 12..16 here) decode from actual P6 bytes,
    // nearest-downsample to 9x8 (the deterministic pixel-center
    // integer law sx = ((2dx+1)w)//18, sy = ((2dy+1)h)//16), then all
    // 64 gradient bits — emitted as two unsigned 32-bit halves so the
    // SQL oracle's power-of-two sums never overflow BIGINT. The
    // oracle replays decode AND resample analytically from the
    // fixture's channel laws. Map-side only, like image_dhash.
    "image_dhash_scaled" -> ((s, d) => {
      val ppm = udf((id: Long) =>
        graft.multimodal.Multimodal.ppmFixtureLarge(id))
      val dh = udf((bytes: Array[Byte]) => {
        val img = graft.multimodal.Multimodal.decodePpm(bytes)
        val h = graft.multimodal.Multimodal.dHash9x8(img)
        (img.width, img.height, h >>> 32, h & 0xffffffffL)
      })
      Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("media_id"), dh(ppm(col("doc_id"))).as("r"))
        .select(col("media_id"), col("r._1").as("width"),
          col("r._2").as("height"), col("r._3").as("dhash_hi"),
          col("r._4").as("dhash_lo"))
    }),

    // multimodal: the image near-dup PAIR search — the banded hamming
    // self-join that makes the dHash fingerprints FEED something (the
    // simhash_pairs shape applied to images): the corpus holds each
    // image and its re-encoded sibling (ppmFixtureLargeReenc, +1 in
    // the red law — gradients survive except at mod-256 wraps, so the
    // pair lands at hamming 0-2), signatures band into 4 disjoint
    // 16-bit keys, and the equi-join on (band, key) shuffles only
    // signature tuples, NEVER the pair space. Pigeonhole: hamming <= 3
    // over 4 bands forces at least one band equal, so the candidate
    // set provably contains every qualifying pair. The oracle is the
    // O(n^2) brute force over analytically-replayed hashes — the
    // exact-but-unscalable form, existing only as the gate.
    "image_dhash_pairs" -> ((s, d) => dhashBandedPairs(dhashMedia(s, d))),

    // multimodal: the END-TO-END image dedup composite — decode ->
    // dHash9x8 -> banded hamming pairs -> connected components ->
    // keep-best representative (the pipeline_clean of images). The
    // verified pair set is staged once (the production shape: one
    // verification job writes the edge list, consumers read it); the
    // graph is metadata-sized (64-bit fingerprints, never payload
    // bytes), components close in a handful of min-label rounds, and
    // the keep rule is resolution DESC then lowest media_id — inside
    // an (original, re-encode) pair both share dimensions, so the
    // ORIGINAL is kept. Singletons keep themselves.
    "image_dedup_pipeline" -> ((s, d) => {
      val sig = dhashMedia(s, d)
      val cc = stagedDhashClusters(s, d)
      val w = Window.partitionBy("cluster")
        .orderBy((col("w") * col("h")).desc, col("media_id"))
      sig.join(cc, sig("media_id") === cc("id"), "left_outer")
        .select(col("media_id"),
          coalesce(col("cluster"), col("media_id")).as("cluster"),
          col("w"), col("h"))
        .withColumn("keep", row_number().over(w) === 1)
        .select("media_id", "cluster", "keep")
    }),

    // multimodal: zero-crossing segmentation over DECODED PCM — the
    // ZCR run structure a VAD-style segmenter starts from. The engine
    // parses the actual RIFF/WAVE bytes (decodeWav), then a
    // ZERO-SHUFFLE Catalyst array fold walks each clip's samples once
    // (state = sign/run-length/max/run-count longs — exact, sequential
    // per row, the dedup_within_doc shape: at 100 TB the decode
    // parallelism is the row partitioning and samples never explode
    // into rows). The oracle computes the same runs by a DIFFERENT
    // algorithm — analytic sample replay + windowed gaps-and-islands —
    // agreeing on exact integers (the median two-algorithm pattern).
    "audio_zcr_segments" -> ((s, d) => {
      val wav = udf((id: Long) => graft.multimodal.Multimodal.wavFixture(id))
      val pcm = udf((bytes: Array[Byte]) =>
        graft.multimodal.Multimodal.decodeWav(bytes).samples.map(_.toInt))
      val init = struct(lit(-1L).as("prev"), lit(0L).as("len"),
        lit(0L).as("maxLen"), lit(0L).as("runs"))
      val folded = aggregate(col("pcm"), init, (acc, x) => {
        val g = when(x < 0, lit(1L)).otherwise(lit(0L))
        val same = acc.getField("prev") === g
        val newLen = when(same, acc.getField("len") + 1L).otherwise(lit(1L))
        struct(g.as("prev"), newLen.as("len"),
          greatest(acc.getField("maxLen"), newLen).as("maxLen"),
          (acc.getField("runs") + when(same, 0L).otherwise(1L)).as("runs"))
      })
      Tables.documents(s, d).filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"), wav(col("doc_id")).as("b"))
        .select(col("media_id"), pcm(col("b")).as("pcm"))
        .select(col("media_id"), folded.as("f"))
        .select(col("media_id"), col("f.runs").as("n_runs"),
          col("f.maxLen").as("longest_run"))
    }),

    // per-document text statistics (quality-scoring features)
    "text_stats" -> ((s, d) => {
      val t = col("text")
      val padded = concat(lit(" "), t, lit(" "))
      Tables.documents(s, d).select(
        col("doc_id"),
        length(t).cast("long").as("n_chars_calc"),
        octet_length(t).cast("long").as("n_bytes"),
        (length(t) - length(regexp_replace(t, " ", "")) + 1).cast("long")
          .as("n_tokens"),
        ((length(padded) - length(regexp_replace(padded, " the ", " "))) / 4)
          .cast("long").as("n_the"))
    }),

    // crude stopword-profile language guess (deterministic heuristic)
    "lang_guess" -> ((s, d) => {
      val t = concat(lit(" "), lower(col("text")), lit(" "))
      def hits(w: String): Column =
        (length(t) - length(regexp_replace(t, s" $w ", " "))) /
          (w.length + 1)
      val en = hits("the") + hits("and") + hits("of")
      val de = hits("der") + hits("und") + hits("die")
      val fr = hits("le") + hits("et") + hits("la")
      val es = hits("el") + hits("y") + hits("los")
      // each score is 3 regex passes and appears 3-4 times in the
      // CaseWhen — hoist them into their own projection so they
      // evaluate ONCE per row (CaseWhen branches defeat codegen
      // subexpression elimination; CollapseProject keeps the split
      // because the aliases are non-cheap and multiply referenced).
      // Same comparisons, same result.
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          en.as("en"), de.as("de"), fr.as("fr"), es.as("es"))
        .select(
          col("doc_id"), col("lang"),
          when(octet_length(col("text")) =!= length(col("text")), "zh")
            .when(col("de") > col("en") && col("de") > col("fr") &&
              col("de") > col("es"), "de")
            .when(col("fr") > col("en") && col("fr") > col("de") &&
              col("fr") > col("es"), "fr")
            .when(col("es") > col("en") && col("es") > col("de") &&
              col("es") > col("fr"), "es")
            .when(col("en") > 0, "en")
            .otherwise("unknown").as("guess"))
    }),

    // fastText-style linear domain classifier INFERENCE (the corpus
    // routing step between crawl and training mix): tokens hash to 256
    // feature buckets (first md5 byte — the corpus_split idiom), a
    // (class x feature) weight table broadcast-joins the per-doc
    // feature-frequency vectors, and argmax over integer class scores
    // picks the domain. The 100 TB shape: per-doc features are
    // pre-aggregated (<= 256 rows/doc) BEFORE the weight join; the
    // model is a 1024-row broadcast, the corpus never shuffles except
    // to regroup its own (doc, feat) pairs; integer weights keep the
    // argmax bit-deterministic (ties break to the lexicographically
    // LAST class on both engines). Weights here are a fixed synthetic
    // model — inference cost and plan shape are identical to a trained
    // one.
    "domain_classify" -> ((s, d) => {
      // the weight matrix is FORMULA-derived (w = pmod(feat·p + q,
      // 1001) − 500 per class), so inference needs no weight table at
      // all: per document, hash each token to its feature once, fold
      // the four class scores as row-local sums over that array
      // (Σ_feat tf·w == Σ_occurrence w — integer-exact), and take the
      // same max-struct argmax. The former shape exploded the corpus,
      // shuffled (doc, feat) twice and broadcast-joined the 1024-row
      // weight table for arithmetic a projection computes in place —
      // output is one row per doc with ZERO exchanges (guide §2.4).
      val classes = Seq(("web", 7L, 13L), ("news", 11L, 97L),
        ("code", 17L, 31L), ("wiki", 23L, 5L))
      // one-pass native argmax (r15): the round-14 map-side form still
      // folded four interpreted aggregate() lambdas over a separately
      // materialized feature array — DomainScore digests each token
      // once and sweeps all four class accumulators in the same pass,
      // inside the WholeStageCodegen span (see its scaladoc for the
      // identity argument: same md5-byte feature, same pmod algebra,
      // same greatest-struct tie rule)
      val m = graft.functions.DomainScore
        .domain_score(words(col("text")), classes)
      Tables.documents(s, d)
        .select(col("doc_id"), m.as("m"))
        .select(col("doc_id"), col("m.cls").as("domain"),
          col("m.score").as("score"))
    }),

    // linear-classifier TRAINING (round 13) — the learn-the-filter
    // half domain_classify's fixed-weight inference leaves open: a
    // batch perceptron (the deterministic member of the family —
    // integer counts, ±1 labels, order-free sum updates; SGD order
    // and sigmoid exp would both break engine parity) learns
    // is-it-English weights over 16 md5-nibble-hashed token features
    // in 3 rounds. ONE corpus scan builds the feature matrix; each
    // round is two matrix-sized aggregates with the 16-row weight
    // table broadcast. The oracle replays all 3 rounds relationally.
    "perceptron_train" -> ((s, d) =>
      graft.operators.Perceptron.train(perceptronFeats(s, d),
        nFeatures = 16, iters = 3)),

    // ...and the end-to-end EVALUATION: the same 3-round training,
    // then every document scores against the FINAL weights and the
    // exact confusion counts come back — the gate a pipeline applies
    // to a learned filter before routing a corpus with it. One extra
    // matrix-sized aggregate after training; all integers.
    "perceptron_confusion" -> ((s, d) =>
      graft.operators.Perceptron.trainConfusion(perceptronFeats(s, d),
        nFeatures = 16, iters = 3)),

    // MULTICLASS one-vs-rest (round 14) — the lang-router shape the
    // binary gates leave open: five binary perceptrons over the SHARED
    // feature matrix (labels derived per class), argmax scoring with
    // ties to the smallest class, exact confusion counts. All integer,
    // so the whole K-chain train-and-evaluate hash-matches the
    // generated relational replay (5 classes x 3 rounds of CTEs).
    "perceptron_ovr_confusion" -> ((s, d) =>
      graft.operators.Perceptron.ovrConfusion(perceptronFeatsMc(s, d),
        classes = Seq("de", "en", "es", "fr", "zh"),
        nFeatures = 16, iters = 3)),

    // BPE-ish token counting: regex token classes (letter runs, digit
    // runs, single punctuation) — the same RE2-safe pattern evaluates
    // identically in Spark and DuckDB
    "token_count_bpe" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
          .as("n_bpe_tokens"))),

    // composite quality score from length/structure features (dyadic
    // weights keep the arithmetic bit-identical across engines)
    "quality_score" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        qualityExpr(col("text")).as("quality"))),

    // Gopher-style repetition filter: the fraction of word trigrams
    // that are duplicates within the document. Entirely map-side — the
    // trigram set is built per row with array functions (tokens are
    // materialized in a prior projection so the split isn't re-run per
    // lambda element), so this scales as a pure projection: no shuffle,
    // no state, embarrassingly parallel at any corpus size. n_grams and
    // n_uniq stay integral; the fraction is one IEEE double division,
    // bit-identical across engines.
    "quality_repetition" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          (size(col("toks")) - 2).cast("long").as("n_grams"),
          expr("""size(array_distinct(transform(
                 |  sequence(0, size(toks) - 3),
                 |  i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))))
                 |""".stripMargin).cast("long").as("n_uniq"))
        .withColumn("dup_frac",
          (col("n_grams") - col("n_uniq")).cast("double") /
            col("n_grams").cast("double"))),

    // exact interpolated quantiles of document length per language —
    // the "how long are my docs" profiling shape. Spark's percentile
    // and DuckDB's quantile_cont both linearly interpolate on the
    // sorted values at rank q*(n-1); inputs are integers, so the
    // interpolation arithmetic is the only float step. Exact
    // percentile sorts per group — fine for profiling; the sketch
    // alternative (approx_percentile) is exercised by approx_stats.
    "quantile_chars" -> ((s, d) =>
      Tables.documents(s, d).groupBy("lang").agg(
        expr("percentile(n_chars, 0.5D)").as("p50_chars"),
        expr("percentile(n_chars, 0.9D)").as("p90_chars"))),

    // vocabulary build + corpus encode: token ids by global frequency
    // rank (ties by token), then every (doc, pos) encoded via a join on
    // the vocab — the tokenizer-table shape of a training-data
    // pipeline. The vocabulary is NOT assumed small (at corpus scale
    // it's 10^8+ terms under Heaps' law), so the global rank is
    // two-phase: range-partition the vocab in rank order, row_number
    // WITHIN each range in parallel, then add per-range base offsets
    // computed from the O(parallelism)-row partition-count relation.
    // No single task ever sees the whole vocabulary, and the encode
    // join is a plain shuffle hash/merge join on the token (AQE may
    // still broadcast it when the vocab is genuinely small — that is a
    // stats-driven choice, not a hint).
    "token_encode" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      // phase 1: non-overlapping rank-ordered ranges; pid is captured
      // right after the range exchange (SparkPartitionID is
      // non-deterministic, so Catalyst cannot move it across the
      // exchange). The (tok, n, pid) relation is MATERIALIZED via
      // localCheckpoint before fan-out: range-partitioner boundaries
      // are sample-based, so if the two consumers below (local ranks;
      // pid base offsets) each re-ran the shuffle they could pick
      // DIFFERENT boundaries and compose wrong token ids — correctness
      // must not hinge on ReuseExchange deduping the subplans. The
      // checkpoint is vocab-sized (the tokenizer-build working set),
      // never the corpus.
      val parts = counts
        .repartitionByRange(col("n").desc, col("tok"))
        .withColumn("pid", spark_partition_id())
        .localCheckpoint()
      val local = row_number().over(
        Window.partitionBy("pid").orderBy(col("n").desc, col("tok")))
      // phase 2: per-range counts cumsum into global base offsets — the
      // unpartitioned window runs over <= spark.sql.shuffle.partitions
      // rows, never the vocabulary
      val baseW = Window.orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bases = parts.groupBy("pid").agg(count(lit(1)).as("c"))
        .select(col("pid"), (sum("c").over(baseW) - col("c")).as("base"))
      val ranked = parts
        .select(col("tok"), col("pid"), local.as("local"))
        .join(broadcast(bases), "pid")
        .select(col("tok"),
          (col("base") + col("local")).cast("long").as("token_id"))
      toks.join(ranked, "tok")
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("token_id"))
    }),

    // sequence packing: assign documents to fixed-length training
    // sequences by a running token count in doc_id order — seq_id =
    // floor(tokens_before / 4096), offset = tokens_before mod 4096.
    // Two-phase cumulative sum (the cluster-scale shape, not a global
    // single-partition window): doc_ids bucket into contiguous ranges,
    // each bucket cumsums under its own window in parallel, the tiny
    // bucket-total relation cumsums once and broadcast-joins back as
    // per-bucket offsets. The bucket width derives from the id span
    // over ~8x parallelism (a 1-row broadcast bounds relation), so the
    // bucket-total relation stays O(cores) at ANY corpus size instead
    // of growing with n_docs. Identical arithmetic to the global
    // window (integer sums), so the same oracle gates it.
    "seq_pack" -> ((s, d) => {
      val seqLen = 4096
      val target = seqPackTargetBuckets(s)
      val n = size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
      val docs = Tables.documents(s, d)
      val bounds = docs.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      val counted = docs
        .select(col("doc_id"), n.as("n"))
        .crossJoin(broadcast(bounds))
        .select(col("doc_id"), col("n"),
          floor((col("doc_id") - col("lo")) /
            greatest(lit(1L), ceil((col("hi") - col("lo") + 1)
              .cast("double") / target).cast("long"))).cast("long")
            .as("bkt"))
      val inBkt = Window.partitionBy("bkt").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bktW = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offsets = counted.groupBy("bkt").agg(sum("n").as("bn"))
        .select(col("bkt"), (sum("bn").over(bktW) - col("bn")).as("base"))
      counted
        .select(col("doc_id"), col("n"), col("bkt"),
          (sum("n").over(inBkt) - col("n")).as("local"))
        .join(broadcast(offsets), "bkt")
        .select(col("doc_id"),
          floor((col("base") + col("local")) / seqLen).cast("long")
            .as("seq_id"),
          ((col("base") + col("local")) % seqLen).cast("long").as("offset"))
    }),

    // context-window chunking: split every document into overlapping
    // token windows (16 tokens, stride 12) — the fixed-length example
    // shaping step between cleaning and sequence packing in a training
    // pipeline. Pure map-side explode (sequence of window starts per
    // doc, slice per window): no shuffle at all, embarrassingly
    // parallel at any corpus size.
    "doc_chunk" -> ((s, d) => {
      val win = 16
      val stride = 12
      val toks = words(col("text"))
      val nChunks = greatest(
        ceil((size(toks) - lit(win)).cast("double") / stride).cast("int"),
        lit(0))
      Tables.documents(s, d)
        .select(col("doc_id"), toks.as("toks"),
          explode(sequence(lit(0), nChunks)).as("k"))
        .select(col("doc_id"), col("k").cast("long").as("chunk_id"),
          size(slice(col("toks"), col("k") * stride + 1, lit(win)))
            .cast("long").as("n_tokens"),
          array_join(slice(col("toks"), col("k") * stride + 1, lit(win)),
            " ").as("chunk"))
    }),

    // reproducible sampling: md5 of the doc id keeps a deterministic
    // ~25% of every stratum — the mix-and-sample step of corpus
    // construction, identical on any engine and any run (no RNG state)
    "sample_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 1).isin("0", "1", "2", "3"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"))),

    // stratified sampling: per-language KEEP RATES (en down to 25%,
    // low-resource langs kept at 50%) — the language-rebalancing step
    // of corpus mixing, still RNG-free: the md5 nibble is the uniform
    // variate, the stratum decides the cut. Map-side filter + 5-group
    // agg; at 100 TB the rates table is a broadcast literal map.
    "stratified_sample" -> ((s, d) => {
      val nib = substring(md5(col("doc_id").cast("string")
        .cast("binary")), 1, 1)
      Tables.documents(s, d)
        .filter(when(col("lang") === "en",
          nib.isin("0", "1", "2", "3"))
          .otherwise(nib.isin("0", "1", "2", "3", "4", "5", "6", "7")))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"),
          sum("n_chars").as("sum_chars"))
    }),

    // PII redaction: the scrub step of corpus cleaning. The synthetic
    // docs carry no PII, so the query first enriches each doc with a
    // deterministic contact string (same derivation on the oracle side),
    // then redacts emails and digit runs with RE2-safe patterns that
    // evaluate identically in Spark's Java regex and DuckDB's RE2.
    // Map-side only — no shuffle at all.
    "pii_redact" -> ((s, d) => {
      val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val t = concat(lower(col("text")), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example tel "),
        col("n_chars").cast("string"))
      val red = regexp_replace(regexp_replace(t, email, "<EMAIL>"),
        "[0-9]+", "<NUM>")
      Tables.documents(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(t, lit(email), lit(0))).cast("long")
          .as("n_emails"),
        size(regexp_extract_all(t, lit("[0-9]+"), lit(0))).cast("long")
          .as("n_numbers"),
        md5(red.cast("binary")).as("redacted_md5"))
    }),

    // corpus SNAPSHOT DIFF — the dataset-versioning verb every curated
    // corpus release needs: which documents were added, removed, or
    // changed between v1 and v2? The v2 snapshot here derives from v1
    // by fixture law (removed: doc_id % 11 == 3; changed: doc_id % 7
    // == 0 gets a re-crawled suffix; added: doc_id % 13 == 5 spawns a
    // new id at +10^9, far above any reachable doc_id at any SF so the
    // synthetic ids can never collide with real ones) — the multimodal
    // analytic-fixture discipline;
    // the OPERATOR is the content-hash full-outer diff. Scale shape:
    // both sides project (doc_id, md5(text)) EARLY so the join ships
    // 16-byte digests, never text; the equi-join on doc_id
    // co-partitions at any size; output is the (usually small) delta.
    "corpus_diff" -> ((s, d) => {
      val v1 = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h1"))
      val base = Tables.documents(s, d)
      val v2 = base.filter(col("doc_id") % 11 =!= 3)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(base.filter(col("doc_id") % 13 === 5)
          .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
        .select(col("doc_id"), md5(col("text").cast("binary")).as("h2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h1").isNull, "added")
            .when(col("h2").isNull, "removed")
            .when(col("h1") =!= col("h2"), "changed").as("change"))
        .filter(col("change").isNotNull)
    }),

    // output sharding manifest: hash-assign every doc to a shard (first
    // md5 nibble — 16 shards), per-shard counts and byte totals. The
    // write-side bookkeeping step of corpus construction; one agg
    // shuffle of 16 groups.
    "shard_manifest" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 1).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))),

    // deterministic global shuffle: the example-ordering step before
    // training. Every doc gets a seeded hash key; the first nibble
    // assigns one of 16 shards and a per-shard window assigns the
    // read position — so the "shuffle" is reproducible on any engine
    // and any cluster size, with no RNG state. The window partitions
    // by shard (never a global sort): shard count scales with the
    // nibble width (2 hex chars = 256 shards, etc.), keeping each
    // partition's sort executor-sized at 100 TB.
    "global_shuffle" -> ((s, d) => {
      val key = md5(concat(lit("seed42:"), col("doc_id").cast("string"))
        .cast("binary"))
      val w = Window.partitionBy("shard").orderBy("key", "doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), key.as("key"),
          substring(key, 1, 1).as("shard"))
        .select(col("doc_id"), col("shard"),
          row_number().over(w).cast("long").as("pos"))
    }),

    // test-set decontamination: flag corpus docs sharing any distinct
    // word-5-gram with the "benchmark" set (stand-in: every 100th doc).
    // The eval-set gram list is small by construction -> broadcast join;
    // the corpus side stays a map-side explode, no corpus-wide shuffle
    // until the per-doc count aggregate.
    "decontam_ngram" -> ((s, d) => {
      val grams = Tables.documents(s, d).select(col("doc_id"),
        explode(shingles5(words(col("text")))).as("g"))
      val evalSet = grams.filter(col("doc_id") % 100 === 0)
        .select("g").distinct()
      grams.filter(col("doc_id") % 100 =!= 0)
        .join(broadcast(evalSet), "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_contaminated_grams"))
    }),

    // embedding-space decontamination: flag corpus vectors whose cosine
    // against ANY benchmark vector (stand-in: vec_id % 97 == 0) clears
    // the near-dup threshold — the semantic complement of
    // decontam_ngram for paraphrased eval leakage. The eval side is
    // small by definition -> broadcast nested-loop against the
    // map-side corpus stream, then a per-vector count agg; no
    // corpus-sized shuffle. Cosines are sequential double folds
    // (DotProductF64), bit-identical to the oracle's list fold.
    "decontam_embed" -> ((s, d) => {
      val dot = graft.functions.GraftFunctions.dot_f64 _
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val ev = e.filter(col("vec_id") % 97 === 0)
        .select(col("v").as("ev"), col("nrm").as("en"))
      e.filter(col("vec_id") % 97 =!= 0)
        .crossJoin(broadcast(ev))
        .filter(dot(col("v"), col("ev")) / (col("nrm") * col("en"))
          >= 0.35)
        .groupBy("vec_id")
        .agg(count(lit(1)).as("n_eval_hits"))
    }),

    // TF-IDF-style term relevance, linear rarity weight tf * N / df
    // (division of exact integers -> bit-identical doubles; ln() is
    // libm-version-dependent, so the linear variant is what an
    // engine-portable pipeline should ship). df is Heaps-law
    // vocab-sized (tens of GB at 100 TB) so it is NOT broadcast by
    // hint — the term join keys on tf's own shuffle key, so tf's
    // exchange is reused and exact stats/AQE pick the build side;
    // top-3 window partitions by doc -> no global sort.
    "tfidf_top_terms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(words(col("text"))).as("term"))
      // tf (one row per (doc, term)) is MATERIALIZED to a scratch
      // parquet before fan-out: its two consumers prune different
      // columns, so Catalyst's column pruning makes the subplans
      // canonically different and ReuseExchange cannot dedupe them —
      // left declarative, the corpus would be exploded and aggregated
      // TWICE. Materializing the intermediate (the shape every
      // production TF-IDF pipeline ships: tf is a table) costs one
      // small write and two column-pruned reads of term-level rows,
      // never a second corpus pass. Plan-pinned in PipelinePlanSpec.
      // Staged once per corpus (not per invocation), so long-lived
      // drivers don't accumulate term-level scratch trees.
      val tf = staged(s, d, "tf") {
        toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      }
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.select(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      // r15 NOTE — the round-14 window-df rewrite (df as a window count
      // over one term repartition; one tf scan, one term exchange) was
      // REVERTED here: the driver measured it 0.82x of this join shape
      // in both its runs (the full posting-stream sort WindowExec pays
      // costs more than the saved scan + aggregate exchange), and at
      // scale that sort is not provably cheaper either — SMJ's
      // per-side sort spills the same stream the window would. The
      // join keys on tf's own shuffle key, so tf's exchange is reused
      // and exact stats/AQE pick the build side.
      tf.join(dfreq, "term").crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          ((col("tf") * col("n_docs")) / col("df")).as("score"))
        .select(col("doc_id"), col("term"), col("score"),
          row_number().over(w).cast("long").as("rank"))
        .filter(col("rank") <= 3)
    }),

    // k-means codebook training (1 Lloyd iteration + final labelling,
    // deterministic seed = the 4 lowest-id vectors) — the trainer
    // behind IVF ANN. Broadcast codebook, map-side argmin assignment,
    // k*dims-wide mean shuffle; see KMeans scaladoc for the 100 TB
    // shape and the decimal-mean determinism argument.
    "kmeans_embed" -> ((s, d) =>
      stagedKmeansAssign(s, d)
        .select(col("id").as("vec_id"),
          col("cluster").cast("long").as("cluster"), col("dist2"))),

    // codebook quality evaluation: the (cluster x gold-label)
    // contingency table of the trained k-means assignment — the
    // clustering-purity check an embedding pipeline runs before
    // trusting a codebook for SemDeDup/IVF routing. One equi-join on
    // vec_id (co-keyed at scale) and a k*labels-group agg.
    "cluster_purity" -> ((s, d) =>
      stagedKmeansAssign(s, d)
        .select(col("id").as("vec_id"),
          col("cluster").cast("long").as("cluster"))
        .join(Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label")),
          "vec_id")
        .groupBy("cluster", "label")
        .agg(count(lit(1)).as("n"))),

    // SemDeDup (cluster-then-dedup): k-means buckets the embeddings,
    // near-dup search runs only WITHIN clusters — O(n^2) -> O(n^2/k) —
    // and per duplicate relation the lowest id survives. Output = the
    // kept vectors with their cluster. Same trained codebook (k=4,
    // 1 Lloyd iteration) as kmeans_embed, so the oracle reuses its CTE.
    "semdedup" -> ((s, d) =>
      graft.operators.SimilarityOps
        .semDedupFromAssigned(stagedKmeansAssign(s, d), 0.45)
        .select(col("id").as("vec_id"),
          col("cluster").cast("long").as("cluster"))),

    // int8 symmetric quantization of the embedding column (the storage
    // format ANN indexes actually ship): per-vector max-abs scale,
    // q_i = round(v_i * 127 / scale), plus the exact reconstruction
    // error. Entirely map-side; the quantized array is hash-projected
    // so the gate compares it without array-representation skew.
    "embed_quantize" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .withColumn("scale", array_max(transform(col("v"), u => abs(u))))
        .withColumn("q", transform(col("v"), u =>
          floor(u * lit(127.0) / col("scale") + lit(0.5)).cast("int")))
      e.select(col("vec_id"), col("scale"),
        md5(concat_ws(",", transform(col("q"), _.cast("string")))
          .cast("binary")).as("qhash"),
        aggregate(zip_with(col("v"), col("q"), (a, b) =>
          (a - b.cast("double") * col("scale") / lit(127.0)) *
            (a - b.cast("double") * col("scale") / lit(127.0))),
          lit(0.0), (acc, u) => acc + u).as("err"))
    }),

    // per-DIMENSION trained scalar quantization (FAISS SQ8): one
    // corpus pass learns each dim's [lo, hi]; codes are 8-bit levels
    // against that per-dim grid — unlike embed_quantize's per-VECTOR
    // max-abs scale, the quantizer here is corpus-trained state (the
    // form an index persists alongside its codes). Output per vector:
    // the code hash + exact reconstruction error. Scale shape: train
    // is a dims-sized aggregate (map-side-combinable min/max), encode
    // is map-side against the broadcast 1-row quantizer.
    "embed_sq8" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val stats = stagedSq8Stats(s, d)
      // encode keeps v, so the err projection is the SAME map-side
      // pass — no corpus-wide join back (plan-audited: the only
      // joins are the two 1-row broadcast cross joins)
      graft.operators.SimilarityOps
        .sq8Encode(e, "vec_id", "embedding", stats)
        .crossJoin(broadcast(stats))
        .select(col("id").as("vec_id"),
          md5(concat_ws(",", transform(col("codes"), _.cast("string")))
            .cast("binary")).as("qhash"),
          aggregate(
            zip_with(col("v"),
              zip_with(col("codes"), arrays_zip(col("lo"), col("s")),
                (c, t) => t.getField("lo") +
                  c.cast("double") * t.getField("s")),
              (a, r) => (a - r) * (a - r)),
            lit(0.0), (acc, u) => acc + u).as("err"))
    }),

    // SQ8 asymmetric-distance retrieval: top-10 neighbors of vec_id 8
    // from CODES ALONE — candidates reconstruct per-dim against the
    // broadcast quantizer, the probe stays exact. The per-dim error
    // bound (s_i/2) makes this near-exact (0.9 recall@10 here, vs 0.2
    // for PQ-ADC's 2-code approximation) at 4× the code footprint —
    // the classic SQ8-vs-PQ index tradeoff, now both demonstrable.
    "ann_sq8" -> ((s, d) => {
      // probe over the STAGED codes — the persisted-index read shape
      // (PQ's stagedPqCodes pattern): the gate measures codes bytes +
      // two broadcast 1-row frames, not a re-train+re-encode
      val probe = Tables.embeddings(s, d).filter(col("vec_id") === 8)
        .select(toDouble(col("embedding")).as("pe"))
      graft.operators.SimilarityOps
        .sq8AdcTopK(stagedSq8Codes(s, d), stagedSq8Stats(s, d),
          probe, 8L, 10)
        .select(col("id").as("vec_id"), col("adist"))
    }),

    // product-quantization codes: every embedding compressed to m=2
    // codes against the staged per-subspace codebooks — 64 float32
    // dims become 2 small ints (the form a 10⁹-row ANN index persists;
    // raw vectors never fit where codes do). Encoding is one map-side
    // argmin against the broadcast m·k codebook.
    "embed_pq" -> ((s, d) =>
      stagedPqCodes(s, d)
        .groupBy(col("id").as("vec_id"))
        .agg(min(when(col("sub") === 0, col("code"))).as("code0"),
          min(when(col("sub") === 1, col("code"))).as("code1"))),

    // PQ asymmetric-distance (ADC) retrieval: top-10 neighbors of
    // vec_id 8 computed from CODES ALONE — the probe's exact dist² to
    // each centroid forms an m·k lookup table (8 rows, broadcast) and
    // each candidate costs m lookups + one addition; no stored vector
    // is read. The 100 TB probe path of an IVF-PQ index.
    "ann_pq_adc" -> ((s, d) => {
      val probe = graft.operators.SimilarityOps.pqSubVecs(
        Tables.embeddings(s, d).filter(col("vec_id") === 8),
        "vec_id", "embedding", 2, 64)
      graft.operators.SimilarityOps.pqAdcTopK(
          stagedPqCodes(s, d), stagedPqCodebook(s, d), probe, 8L, 10)
        .select(col("id").as("vec_id"), col("adist"))
    }),

    // the full PQ probe path: ADC shortlist-50 from codes alone, then
    // an EXACT re-rank that reads only those 50 vectors — production
    // PQ (ADC@k alone is tie-dominated on tight neighborhoods; the
    // shortlist+rerank recovers exact-rank quality, measured at 0.8
    // recall@10 in PqSpec, while touching 50 vectors instead of the
    // corpus).
    "ann_pq_rerank" -> ((s, d) =>
      graft.operators.SimilarityOps.pqAdcRerank(
          Tables.embeddings(s, d), "vec_id", "embedding", 2, 64,
          stagedPqCodes(s, d), stagedPqCodebook(s, d), 8L, 50, 10)
        .select(col("id").as("vec_id"), col("d2"))),

    // IVF-PQ, the flagship composed ANN shape (FAISS IndexIVFPQ):
    // the COARSE quantizer (the staged k=4 k-means assignment) prunes
    // to the probe's cell, then ADC ranks WITHIN the cell from codes
    // alone. At scale: coarse cells are partition directories (the
    // ann_ivf_bucketed layout), PQ codes are the only per-row payload
    // read, and the probe cost is |cell|/|corpus| code bytes + one
    // broadcast LUT — the two pruning levers multiply.
    "ann_ivfpq" -> ((s, d) => {
      val assigned = stagedKmeansAssign(s, d)
      val pc = assigned.filter(col("id") === 8)
        .select(col("cluster").as("pc"))
      val cellIds = assigned.join(broadcast(pc), col("cluster") === col("pc"))
        .select("id")
      val probe = graft.operators.SimilarityOps.pqSubVecs(
        Tables.embeddings(s, d).filter(col("vec_id") === 8),
        "vec_id", "embedding", 2, 64)
      graft.operators.SimilarityOps.pqAdcTopK(
          stagedPqCodes(s, d).join(cellIds, "id"),
          stagedPqCodebook(s, d), probe, 8L, 10)
        .select(col("id").as("vec_id"), col("adist"))
    }),

    // incremental ingest dedup: a new batch (upper half of doc_ids)
    // joins against the EXISTING corpus's fingerprint set and keeps
    // only unseen content — the daily-ingest shape. Left anti join on
    // the fingerprint: at scale the existing side is a bucketed
    // fingerprint table and this is a shuffle-free probe.
    "dedup_incremental" -> ((s, d) => {
      val fp = graft.functions.WordSetFingerprint
        .word_set_fingerprint(col("text"))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        fp.as("fp"))
      val existing = docs.filter(col("doc_id") < 250).select("fp").distinct()
      docs.filter(col("doc_id") >= 250)
        .join(existing, Seq("fp"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_new"), min("doc_id").as("first_new"))
    }),

    // bloom-accelerated incremental dedup — the daily-ingest scale
    // path when the anti-join's right side is the WHOLE corpus: a
    // bloom filter over the existing fingerprints (a few bytes per
    // key, built once per release) screens the batch map-side;
    // mightContain=false proves NEW (bloom has no false negatives),
    // so only the might-contain sliver reaches the exact anti-join
    // and the corpus-sized shuffle shrinks to |dups| + fp-rate.
    // False positives are weeded by the exact join, so the OUTPUT is
    // deterministic — identical to the plain anti-join, which is
    // exactly what the oracle computes. (Streaming twin:
    // DocStreams.admit screens eval-set grams the same way.)
    "dedup_incremental_bloom" -> ((s, d) => {
      val fp = graft.functions.WordSetFingerprint
        .word_set_fingerprint(col("text"))
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        fp.as("fp"))
      val existing = docs.filter(col("doc_id") < 250).select("fp").distinct()
      // size the filter from the data (one cheap count job): a bloom
      // sized for a constant N degrades toward fpp=1 once the corpus
      // outgrows it — correctness survives (the exact join weeds false
      // positives) but every batch row would flow through the anti-join
      // and the pre-filter stops paying for itself. Built ONCE per
      // (session, corpus) through the staged registry — the filter is
      // a release-level index artifact like the bloom sidecars, and
      // rebuilding it on every query build cost two extra corpus jobs
      // per invocation
      val bloom = stagedObj(s, d, "incrbloom") {
        existing.stat.bloomFilter("fp",
          math.max(existing.count(), 1L), 0.03)
      }
      val mightContain = udf((f: String) =>
        f != null && bloom.mightContainString(f))
      val batch = docs.filter(col("doc_id") >= 250)
      val definiteNew = batch.filter(!mightContain(col("fp")))
      val confirmed = batch.filter(mightContain(col("fp")))
        .join(existing, Seq("fp"), "left_anti")
      definiteNew.unionByName(confirmed)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_new"), min("doc_id").as("first_new"))
    }),

    // file-level bloom index point lookup: documents land in 16
    // content-hash-placed buckets (placement deliberately UNCORRELATED
    // with doc_id — the layout zone maps and z-order can't help, since
    // every file's [min,max] id range contains every probe), with a
    // per-bucket doc_id bloom sidecar built in one mergeable-aggregate
    // pass. The lookup reads the sidecar (metadata-sized) plus ONLY
    // the matching bucket dirs — at 10⁹ files this is the Delta/
    // Iceberg bloom-index shape; FileBloomIndexSpec pins the pruning
    // via inputFiles and the no-false-negative law.
    "bloom_point_lookup" -> ((s, d) => {
      val idx = stagedBloomIndex(s, d)
      graft.sources.FileBloomIndex.lookup(s, idx, "doc_id", "7")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // incremental ingest into the bloom index: build over the first
    // half of the corpus, APPEND the second half (new part files into
    // the existing bucket dirs — untouched files byte-identical,
    // sidecar blooms merged by bitwise OR, both pinned in
    // FileBloomIndexSpec), then point-look-up a doc from the appended
    // batch. The build+append stage once per JVM (the ann_ivf_
    // incremental pattern: bench medians measure the post-ingest
    // read; ScaleSmoke times it cold/build-inclusive via buildGated);
    // the oracle is the plain point filter over the union, which the
    // no-false-negative law guarantees the pruned read equals.
    "bloom_lookup_incremental" -> ((s, d) => {
      val idx = stagedPath(s, d, "fbloominc") { p =>
        val docs = Tables.documents(s, d)
        val half = docs.filter(col("doc_id") < 250)
        graft.sources.FileBloomIndex.write(half, "doc_id",
          pmod(hash(col("text")), lit(16)), p,
          math.max(docs.count() / 16, 64L))
        graft.sources.FileBloomIndex.append(
          docs.filter(col("doc_id") >= 250), "doc_id",
          pmod(hash(col("text")), lit(16)), p)
      }
      graft.sources.FileBloomIndex.lookup(s, idx, "doc_id", "300")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // full bloom-index LIFECYCLE gate: build on the first half,
    // append the rest, COMPACT the fragmented bucket dirs (dynamic
    // partition overwrite, content preserved row-for-row, sidecar
    // untouched — FileBloomIndexSpec pins files-per-bucket and the
    // byte-identical sidecar), then point-look-up — the answer must
    // equal the plain point filter, which the shared oracle checks.
    "bloom_lookup_compacted" -> ((s, d) => {
      val idx = stagedPath(s, d, "fbloomcmp") { p =>
        val docs = Tables.documents(s, d)
        val layout = pmod(hash(col("text")), lit(16))
        graft.sources.FileBloomIndex.write(
          docs.filter(col("doc_id") < 250), "doc_id", layout, p,
          math.max(docs.count() / 16, 64L))
        graft.sources.FileBloomIndex.append(
          docs.filter(col("doc_id") >= 250), "doc_id", layout, p)
        graft.sources.FileBloomIndex.compact(s, p)
      }
      graft.sources.FileBloomIndex.lookup(s, idx, "doc_id", "300")
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // TOMBSTONE delete on the bloom index — bloom bits cannot be
    // unset, so deletes are a metadata-sized key sidecar every read
    // path anti-joins (round 13; the deletion-vector verb the IVF
    // index already carried): build over the corpus, delete two ids,
    // look up two deleted + two live keys — only the live rows may
    // come back, which is exactly what the oracle's plain filter
    // replays. No data file is read or rewritten by the delete.
    "bloom_lookup_deleted" -> ((s, d) => {
      val idx = stagedPath(s, d, "fbloomdel") { p =>
        val docs = Tables.documents(s, d)
        graft.sources.FileBloomIndex.write(docs, "doc_id",
          pmod(hash(col("text")), lit(16)), p,
          math.max(docs.count() / 16, 64L))
        graft.sources.FileBloomIndex.delete(s, p, Seq("7", "300"))
      }
      // one pruned read for all four probes (lookupMany) — the
      // per-key union paid four listings + four scan jobs for the
      // same row set
      graft.sources.FileBloomIndex
        .lookupMany(s, idx, "doc_id", Seq("7", "8", "300", "301"))
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // ...and the PURGE: compact physically rewrites only the buckets
    // holding deleted keys, REBUILDS those buckets' blooms from the
    // surviving rows (touched shards only — the others byte-identical,
    // pinned in FileBloomIndexSpec), and clears the tombstones — after
    // which the same lookups answer identically without paying the
    // mask. Same oracle: purge must change no answer.
    "bloom_lookup_purged" -> ((s, d) => {
      val idx = stagedPath(s, d, "fbloompur") { p =>
        val docs = Tables.documents(s, d)
        graft.sources.FileBloomIndex.write(docs, "doc_id",
          pmod(hash(col("text")), lit(16)), p,
          math.max(docs.count() / 16, 64L))
        graft.sources.FileBloomIndex.delete(s, p, Seq("7", "300"))
        graft.sources.FileBloomIndex.compact(s, p)
      }
      // one pruned read for all four probes (lookupMany) — the
      // per-key union paid four listings + four scan jobs for the
      // same row set
      graft.sources.FileBloomIndex
        .lookupMany(s, idx, "doc_id", Seq("7", "8", "300", "301"))
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // BULK membership against the bloom index — the backfill shape
    // (round-13 close of the existingKeys driver-loop edge): a probe
    // set of every-7th doc_id plus as many ABSENT ids tests
    // EXECUTOR-side against the broadcast (memoized) sidecar filters;
    // the confirm read is pruned to the union of candidate buckets
    // and weeds the bloom's false positives, so the answer is exactly
    // the present keys — which is what the oracle replays as a plain
    // semi-filter. No driver key loop anywhere: 10⁵ backfill keys
    // cost one broadcast + one pruned join, not 10⁵ × buckets driver
    // bloom tests.
    "bloom_bulk_membership" -> ((s, d) => {
      val idx = stagedBloomIndex(s, d)
      val probes = Tables.documents(s, d)
        .filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").cast("string").as("k"))
        .unionAll(Tables.documents(s, d)
          .filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000).cast("string").as("k")))
      graft.sources.FileBloomIndex
        .existingKeysDf(s, idx, "doc_id", probes, "k")
        .orderBy(col("k"))
    }),

    // Deequ-style data-quality constraint checks in ONE corpus pass:
    // completeness (non-null), key uniqueness, value bounds, and a
    // domain constraint, each emitted as (check, passed_rows, total,
    // passed). The validation layer a production ingest runs before
    // promoting a batch; all counts are exact longs. Scale shape: one
    // aggregate job (countDistinct adds its expand), then a 4-element
    // literal explode of the single metrics row.
    "quality_checks" -> ((s, d) => {
      val m = Tables.documents(s, d).agg(
        count(lit(1)).as("n"),
        count(col("text")).as("text_nonnull"),
        countDistinct(col("doc_id")).as("id_distinct"),
        count(when(col("n_chars").between(1, 10000), 1))
          .as("chars_in_bounds"),
        count(when(col("lang").isin("de", "en", "es", "fr", "zh"), 1))
          .as("lang_in_set"))
      def check(name: String, passedRows: org.apache.spark.sql.Column) =
        struct(lit(name).as("check"), passedRows.as("passed_rows"),
          col("n").as("total"), (passedRows === col("n")).as("passed"))
      m.select(explode(array(
          check("completeness_text", col("text_nonnull")),
          check("uniqueness_doc_id", col("id_distinct")),
          check("bounds_n_chars_1_10000", col("chars_in_bounds")),
          check("domain_lang", col("lang_in_set")))).as("c"))
        .select("c.*")
    }),

    // cluster -> kept representative: the step between "found near-dup
    // clusters" and "emitted one doc per cluster" — keep the highest-
    // quality member (ties to the lowest doc_id) via a partial-agg
    // argmax over (quality, -doc_id), no window over the corpus.
    "dedup_keep_best" -> ((s, d) => {
      val clusters = stagedClusters(s, d)
      val q = Tables.documents(s, d)
        .select(col("doc_id"), qualityExpr(col("text")).as("quality"))
      clusters.join(q, "doc_id")
        .groupBy("cluster")
        .agg(max(struct(col("quality").as("q"), (-col("doc_id")).as("nid")))
          .as("m"), count(lit(1)).as("n_members"))
        .select(col("cluster"), (-col("m.nid")).as("keep_id"),
          col("n_members"), col("m.q").as("best_quality"))
    }),

    // fuzzy near-match pairs by edit distance with blocking: candidate
    // pairs come from an equi-join on a cheap blocking key (first TWO
    // tokens — the block size, not the prefix length, is what the
    // quadratic cost rides on), and the O(len^2) levenshtein runs only
    // inside blocks on a 30-char prefix — the title/URL fuzzy-dedup
    // shape. The pair join goes through boundedBlockPairs, so a hot
    // block (common boilerplate prefix) sub-splits into cap-bounded
    // cells instead of going quadratic in one task — identical output,
    // same oracle. Both engines implement levenshtein as the same
    // integer DP -> deterministic.
    "fuzzy_title_pairs" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        substring(col("text"), 1, 30).as("head"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"))
      graft.operators.SimilarityOps.boundedBlockPairs(t, "blk", "doc_id", 256)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          levenshtein(col("a.head"), col("b.head")).cast("long").as("dist"))
        .filter(col("dist") <= 5)
    }),

    // grouped top-k through the custom physical operator
    // (plans/GroupedTopK): heap-bounded partials shuffle <= k rows per
    // (group, partition) instead of window-sorting the corpus. The
    // "top documents per language/domain" selection step; unique
    // (n_chars desc, doc_id) order keeps it deterministic.
    "topk_per_lang" -> ((s, d) =>
      graft.operators.TopKOps.topKPerGroup(
        Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
        Seq("lang"), Seq("n_chars" -> false, "doc_id" -> true), 3)),

    // vocabulary sizing by coverage: the smallest frequency-sorted
    // vocabulary prefix covering >= 95% of token mass — the question a
    // tokenizer-vocab budget answers. TWO-LEVEL form: the vocabulary
    // itself never flows through a window. Tokens aggregate to
    // (token, cnt) once (the only corpus-sized shuffle), then
    // collapse to COUNT-VALUE bands (cnt, nrows, mass) — at most
    // O(sqrt(total mass)) rows at ANY corpus size, since n distinct
    // count values need >= n(n+1)/2 total mass — and the running sum
    // windows over those bands only. Within the boundary band every
    // row contributes exactly `cnt`, and tie order (by token) cannot
    // move the crossing, so the first crossing ROW is pure integer
    // arithmetic: m = ceil((total*95 - prior*100) / (cnt*100)) rows
    // into the band. Same all-integer 95% law (cum*100 >= total*95),
    // same answer and hash as the row-level window, no single-task
    // vocabulary sort anywhere.
    "vocab_coverage" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(words(col("text"))).as("token"))
      // materialized once: bands and the total both read the
      // vocab-sized aggregate — the corpus is scanned exactly ONCE
      val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
      val bands = counts.groupBy("cnt")
        .agg(count(lit(1)).as("nrows"))
        .withColumn("mass", col("cnt") * col("nrows"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc)
      bands
        .withColumn("cum_mass", sum(col("mass")).over(w))
        .withColumn("cum_rows", sum(col("nrows")).over(w))
        .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("total"))))
        // boundary band: the FIRST (largest-cnt) band whose cumulative
        // mass crosses the threshold; its predecessor is strictly
        // below, so the needed remainder is positive
        .filter(col("cum_mass") * 100 >= col("total") * 95)
        .orderBy(col("cnt").desc).limit(1)
        .withColumn("need",
          col("total") * 95 - (col("cum_mass") - col("mass")) * 100)
        .withColumn("m",
          expr("(need + cnt * 100 - 1) div (cnt * 100)"))
        .select(
          (col("cum_rows") - col("nrows") + col("m")).as("vocab_size"),
          (col("cum_mass") - col("mass") + col("m") * col("cnt"))
            .as("covered"),
          col("total"))
    }),

    // DSIR-style hashed importance weights: score every document by
    // how much its hashed-unigram profile resembles a TARGET domain
    // (here lang='en') relative to the whole corpus — the data-
    // selection weighting used to upsample in-domain text. Bucket
    // ratios are integer micro-units ((t+1)*1e6 div (c+1)) and the
    // per-doc score is a sum of longs, so the result is exact and
    // order-free on both engines. Scale shape: the 64-bucket ratio
    // table broadcasts; the per-(doc,bucket) count is map-side
    // combinable; nothing corpus-sized shuffles except one token
    // count pass. (The bucket law is a deliberately SQL-replayable
    // stand-in — production would use a real feature hash.)
    "dsir_weights" -> ((s, d) => dsirWeightsDf(s, d)),

    // DSIR importance RESAMPLING — the materialization step after the
    // weights: every doc replicates 1 + min(weight div mean, 3) times
    // (all integer: the mean is an integer div of the weight total, so
    // the copy counts are exact and engine-replayable), upsampling
    // in-domain text the way the selection paper's sampler would. The
    // gate aggregates the EXPLODED rows per lang — the explode is the
    // product (the resampled corpus), the counts prove it happened.
    // Scale shape: output tracks Σ copies ≤ 4n; the mean is one
    // broadcast scalar; the explode is map-side.
    "dsir_resample" -> ((s, d) => {
      // three consumers (mean, copies, explode) read the weights —
      // checkpoint so the token pipeline runs ONCE, not per consumer
      val w = dsirWeightsDf(s, d).localCheckpoint(true)
      val mean = w.agg(expr("sum(weight) div count(1)").as("mw"))
      val copies = w.crossJoin(broadcast(mean))
        .select(col("doc_id"),
          (lit(1L) + least(expr("weight div mw"), lit(3L))).as("copies"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(copies, "doc_id")
        .select(col("lang"), col("copies"),
          explode(sequence(lit(1L), col("copies"))).as("k"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("copies") > 1 && col("k") === 1, 1))
            .as("n_upsampled"))
    }),

    // per-document near-dup NEIGHBOR list: for every document, its 2
    // most similar candidates by exact shingle-Jaccard over the LSH
    // band candidates — the kNN-graph form of dedup review ("show me
    // what this doc nearly duplicates"). Rides the staged signature
    // table and the heap-bounded GroupedTopK operator: per-group
    // partial heaps, k-bounded shuffle, no corpus-wide window sort.
    "neardup_topk" -> ((s, d) => {
      val inter = size(array_intersect(col("sa"), col("sb")))
      val jac = inter.cast("double") /
        (size(col("sa")) + size(col("sb")) - inter)
      val undirected = candidateShingles(s, d)
        .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.2)
      val directed = undirected
        .select(col("doc_a").as("src"), col("doc_b").as("dst"),
          col("jaccard"))
        .unionAll(undirected.select(col("doc_b").as("src"),
          col("doc_a").as("dst"), col("jaccard")))
      graft.operators.TopKOps.topKPerGroup(directed, Seq("src"),
        Seq("jaccard" -> false, "dst" -> true), 2)
    }),

    // sketch-based corpus profiling: HLL++ distinct counts and GK
    // approximate percentiles — mergeable partial aggregates, the
    // profiling shape that stays one pass at 100 TB where exact
    // distinct/percentile would shuffle the corpus. Sketch INTERNALS
    // differ by engine, so the oracle is TOLERANCE-BANDED: each engine
    // computes its own sketches AND its own exact anchors, and emits
    // booleans (estimate within ±5% of exact NDV; approx percentile
    // within ±5% RANK of its target — integer rank counting, so no
    // float-edge flakiness) plus the exact anchors. Hash-comparing the
    // booleans + anchors is a REAL cross-engine check: a broken sketch
    // on either side flips a boolean. In-engine error-bound gates live
    // in ApproxStatsSpec.
    "approx_stats" -> ((s, d) => {
      val base = Tables.documents(s, d).select("lang", "text", "n_chars")
      val sk = base.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("distinct_texts"),
        approx_count_distinct(col("text"), 0.01).as("andv"),
        percentile_approx(col("n_chars").cast("double"), lit(0.5),
          lit(10000)).as("p50a"),
        percentile_approx(col("n_chars").cast("double"), lit(0.95),
          lit(10000)).as("p95a"))
      val ranks = base
        .join(broadcast(sk.select("lang", "p50a", "p95a")), "lang")
        .groupBy("lang").agg(
          sum(when(col("n_chars") <= col("p50a"), 1L).otherwise(0L))
            .as("le50"),
          sum(when(col("n_chars") <= col("p95a"), 1L).otherwise(0L))
            .as("le95"))
      // percentile bands are ±10% RANK (not the sketches' ~0.01%
      // guarantee): the slack absorbs the worst-case inter-engine
      // value gap across a tie plateau — Spark's GK returns an
      // observed value, DuckDB's t-digest may interpolate, and if >5%
      // of a group's mass sits exactly at the band edge the two
      // engines' counted fractions could otherwise land on opposite
      // sides and flip the boolean on one side only. A genuinely
      // broken sketch is off by far more than 10% rank.
      sk.join(ranks, "lang").select(
        col("lang"), col("n_docs"), col("distinct_texts"),
        (abs(col("andv") - col("distinct_texts")) <=
          greatest(col("distinct_texts") * 0.05, lit(2.0))).as("ndv_ok"),
        (col("le50") * 100 >= col("n_docs") * 40 &&
          col("le50") * 100 <= col("n_docs") * 60).as("p50_ok"),
        (col("le95") * 100 >= col("n_docs") * 88).as("p95_ok"))
    }),

    // weighted corpus mixture: per-source target fractions (25/50/75/
    // 100% by source index mod 4) enforced with deterministic md5-
    // nibble thresholds — the mix step of corpus construction, map-side
    // filter + one small agg shuffle, reproducible on any engine/run.
    "corpus_mix" -> ((s, d) => {
      val m = substring(col("source"), 4, 10).cast("int") % 4
      val nib = substring(md5(col("doc_id").cast("string").cast("binary")),
        1, 1)
      val keep = when(m === 3, lit(true))
        .otherwise(nib < when(m === 0, "4").when(m === 1, "8").otherwise("c"))
      Tables.documents(s, d).filter(keep)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("kept_chars"))
    }),

    // IVF with the TRAINED codebook: kmeans_embed's centroids replace
    // the first-k-rows stand-in of ann_ivf; euclidean argmin
    // assignment (the training objective), probe-cell-only exact
    // scoring. Same broadcast/map-side scale shape, data-following
    // cells.
    "ann_ivf_kmeans" -> ((s, d) =>
      graft.operators.SimilarityOps
        .annIvfFromAssigned(stagedKmeansAssign(s, d), 8L, 10)
        .select(col("id").as("vec_id"), col("cosine"))),

    // end-to-end cleaning pipeline: exact dedup (keep lowest doc_id per
    // content hash) -> quality gate -> per-language corpus stats. The
    // composition a training-data job actually runs, as one plan:
    // one hash-partition window for dedup, one aggregation shuffle.
    "pipeline_clean" -> ((s, d) => {
      val w = Window.partitionBy(md5(col("text").cast("binary")))
        .orderBy("doc_id")
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .filter(qualityExpr(col("text")) >= 0.5)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(regexp_extract_all(lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long"))
            .as("n_tokens"))
    }),

    // as-of join (composed, not a custom operator): for every view
    // event, the latest click by the same user at-or-before it.
    // Carry-forward window = one shuffle on user_id + one sort — the
    // scalable shape; no per-row range probe, no O(n^2).
    "join_asof" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("last_click_us",
          last(when(col("event_type") === "click", unix_micros(col("ts"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("last_click_us"),
          (unix_micros(col("ts")) - col("last_click_us")).as("gap_us"))
    }),

    // merge_asof(tolerance=...) semantics: the same backward as-of
    // join, but a click older than ONE HOUR does not attribute — the
    // match nulls out instead of reaching arbitrarily far back. Same
    // single keyed-window shape (no extra shuffle for the tolerance;
    // it is a post-window projection).
    "join_asof_tol" -> ((s, d) => {
      val tolUs = 3600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("lc",
          last(when(col("event_type") === "click", unix_micros(col("ts"))),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "view")
        .withColumn("gap", unix_micros(col("ts")) - col("lc"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          when(col("gap") <= tolUs, col("lc")).as("last_click_us"),
          when(col("gap") <= tolUs, col("gap")).as("gap_us"))
    }),

    // winnowing fingerprint (Schleimer et al. 2003) via the
    // RollingFingerprint expression, exploded to scalar (doc_id, fp) rows
    // (array columns break the driver's pandas canonicalization); the
    // modular hash is replayed exactly by the DuckDB oracle
    "doc_winnow" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        explode(graft.functions.RollingFingerprint
          .rolling_fingerprint(col("text"), 5, 4)).as("fp"))),

    // corpus token histogram (wordcount — the canonical explode+agg)
    "token_hist" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(words(col("text"))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))),

    // hourly windowed event aggregation (Structured-Streaming-shaped)
    "events_hourly" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          // string round-trip -> DOUBLE: see RelationalQueries.dsum scaladoc
          sum(col("value").cast(DecimalType(18, 6)))
            .cast("string").cast("double").as("sum_value"))
        .select(col("window.start").as("hour_start"), col("event_type"),
          col("cnt"), col("sum_value"))),

    // conversion funnel: for every view, did the same user click within
    // 10 minutes? One carry-backward window per user (min future click
    // ts over the following frame) — no self-join, one shuffle.
    "events_funnel" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.events(s, d)
        .withColumn("next_click_us",
          min(when(col("event_type") === "click", unix_micros(col("ts"))))
            .over(w))
        .filter(col("event_type") === "view")
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"))
        .agg(count(lit(1)).as("n_views"),
          sum(when(col("next_click_us") - unix_micros(col("ts"))
            <= 600000000L, 1L).otherwise(0L)).as("n_converted"))
    }),

    // hour-over-hour retention: users active in hour h who return in
    // h+1 — distinct (user, hour) self-joined one hour ahead
    "events_retention" -> ((s, d) => {
      // hour-over-hour retention WITHOUT the hu-self-join (which paid
      // the distinct exchange plus two join re-shuffles on shifted
      // keys): cluster by user once; the per-user distinct hours and
      // the lead() window then share that partitioning, and a user is
      // retained at h iff the NEXT distinct hour is exactly h+1 — no
      // hour can sit between h and h+1, so lead() sees every
      // qualifying pair exactly once (= the join's match set). One
      // event-sized exchange + the tiny per-hour aggregate.
      Tables.events(s, d)
        .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .repartition(col("user_id"))
        .groupBy("user_id", "h").agg(count(lit(1)).as("_c"))
        .withColumn("nxt", lead(col("h"), 1).over(
          Window.partitionBy("user_id").orderBy("h")))
        .filter(col("nxt") === col("h") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("h").as("hour_start"))
        .agg(count(lit(1)).as("n_retained"))
    }),

    // z-order layout pruning: the events table staged ONCE per JVM as
    // 16 parquet files z-ordered on (user_id, value) — each file a
    // small rectangle in key space — then a 2-D range query answered
    // from it. Results are layout-independent (the oracle is the same
    // SQL over the plain table); the LAYOUT claim (per-file min/max
    // boxes shrink on BOTH dims, the query rectangle intersects only
    // a few files' stat boxes) is pinned in ZOrderSpec. At 100 TB the
    // footer-stats intersection is the difference between a full scan
    // and touching a handful of files — the OPTIMIZE ZORDER lever.
    "zorder_prune" -> ((s, d) => {
      val ev = stagedZOrderEvents(s, d)
      val b = ev.agg(
        floor((max(col("user_id")) * 2) / 10.0).as("lo"),
        floor((max(col("user_id")) * 4) / 10.0).as("hi"))
      ev.crossJoin(broadcast(b))
        .filter(col("user_id").between(col("lo"), col("hi")) &&
          col("value").between(100.0, 250.0))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 6)))
            .cast("string").cast("double").as("sum_value"),
          min("user_id").as("min_uid"), max("user_id").as("max_uid"))
    }),

    // the EQUI-DEPTH z-order writer (round 13, the skew-robust
    // variant ZOrder's scaladoc always named): keys rank-normalize
    // through 255 approximate-quantile boundaries instead of min-max,
    // so file stat-boxes keep shrinking even when 99% of the mass
    // sits in 1% of the range (pinned on a skewed fixture in
    // ZOrderSpec). Layout only — the oracle is the same aggregate
    // over the plain table, and the answer must be identical.
    "zorder_prune_eq" -> ((s, d) => {
      val ev = stagedZOrderEventsEq(s, d)
      val b = ev.agg(
        floor((max(col("user_id")) * 3) / 10.0).as("lo"),
        floor((max(col("user_id")) * 6) / 10.0).as("hi"))
      ev.crossJoin(broadcast(b))
        .filter(col("user_id").between(col("lo"), col("hi")) &&
          col("value").between(50.0, 200.0))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 6)))
            .cast("string").cast("double").as("sum_value"),
          min("user_id").as("min_uid"), max("user_id").as("max_uid"))
    }),

    // user growth: first-seen day per user -> new users per day ->
    // cumulative total. Two shuffles (user agg, day agg); the running
    // sum's window is over DAYS — a tiny domain — so the unpartitioned
    // window is a non-issue at any event volume.
    "user_growth" -> ((s, d) => {
      val firstDay = Tables.events(s, d).groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).as("day"))
      firstDay.groupBy("day").agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users",
          sum(col("new_users")).over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }),

    // sessionization: 5-minute-gap sessions per user via LAG
    "events_sessions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 300000000L, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum("brk").as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // the dedup dashboard: per-language duplication rates under both
    // identity notions at once — byte-exact (md5 of the text) and
    // fuzzy (word-set fingerprint) — the numbers a corpus report leads
    // with. One scan, one agg shuffle; DISTINCTs expand via Spark's
    // single Expand, not one job per measure.
    "dedup_report" -> ((s, d) => {
      val fp = graft.functions.WordSetFingerprint
        .word_set_fingerprint(col("text"))
      Tables.documents(s, d)
        .select(col("lang"), md5(col("text").cast("binary")).as("h"),
          fp.as("fp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_unique_exact"),
          countDistinct(col("fp")).as("n_unique_fp"),
          ((count(lit(1)) - countDistinct(col("h"))).cast("double") /
            count(lit(1))).as("exact_dup_rate"),
          ((count(lit(1)) - countDistinct(col("fp"))).cast("double") /
            count(lit(1))).as("fuzzy_dup_rate"))
    }),

    // bigram-commonness scoring — the linear, engine-portable cousin of
    // LM-perplexity quality filtering: each document scores the mean
    // corpus frequency of its bigram occurrences (log-free: integer
    // counts -> one exact double division). Bigram cardinality grows
    // near-linearly with the corpus, so the frequency table is NEVER
    // broadcast by hint: the join keys on b, which is already the
    // aggregate's shuffle key, so bg's exchange is reused on both
    // sides and the join adds no new corpus-wide shuffle. AQE may
    // still broadcast when the table is genuinely small.
    "bigram_commonness" -> ((s, d) => {
      val w = split(col("text"), " ")
      val bgs = zip_with(
        slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
        (a, b) => concat(a, lit(" "), b))
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), explode(bgs).as("b"))
      // ONE corpus explode and NO join (the former global-count +
      // bg-join shape exploded the corpus twice and shuffled it three
      // times): repartition by bigram once, per-(b, doc) counts k and
      // the global count n = sum(k) over the same partitioning (the
      // groupBy and the window both cluster on b, so neither adds an
      // exchange), then the per-doc fold. Integer identity: the mean
      // over OCCURRENCES of n equals sum(k·n)/sum(k) — both sums are
      // exact longs, the final division is the same double op.
      val byB = bg.repartition(col("b"))
        .groupBy("b", "doc_id").agg(count(lit(1)).as("k"))
        .withColumn("n",
          sum(col("k")).over(Window.partitionBy("b")))
      byB.groupBy("doc_id")
        .agg(sum("k").as("n_bigrams"),
          (sum(col("k") * col("n")).cast("double") / sum("k"))
            .as("mean_bg_freq"))
    }),

    // one BPE merge iteration (the inner loop of subword-tokenizer
    // training, Sennrich et al. 2016): count adjacent CHARACTER pairs
    // weighted by word frequency and surface the top merge candidates.
    // The scalable shape: ONE corpus-sized shuffle builds the word
    // frequency table; the character-pair explosion then runs over the
    // DISTINCT vocabulary (thousands of rows) weighted by the counts —
    // at 100 TB the pair stage costs vocab-size, not corpus-size, which
    // is what makes iterated merges (30k-50k of them for a real
    // tokenizer) tractable at all.
    "bpe_merge_pairs" -> ((s, d) => {
      val wf = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("f"))
      wf.filter(length(col("word")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, length(word) - 1), " +
            "i -> struct(substring(word, i, 1) AS a, " +
            "substring(word, i + 1, 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(20)
    }),

    // the FULL tokenizer-training loop bpe_merge_pairs is one round
    // of (round 13): 5 greedy merges over the evolving vocabulary —
    // ONE corpus scan for word frequencies, then every round is
    // vocabulary-sized with the winner recomputed and applied via
    // deterministic string surgery (see BpeTrain's scaladoc for the
    // double-space non-overlap argument). The oracle replays all 5
    // rounds relationally — a generated CTE chain — so the hash gate
    // proves both engines LEARN the same merge table, not just count
    // the same pairs.
    "bpe_train" -> ((s, d) =>
      graft.operators.BpeTrain.train(Tables.documents(s, d), "text", 5)),

    // BATCHED BPE training (round 14) — the 30k-50k-vocabulary path:
    // 3 rounds x up to 8 mutually NON-INTERACTING merges each, all of
    // a round's merges applied in ONE vocabulary pass (disjoint
    // symbol sets commute). Selection is the conservative disjoint
    // rule over the top-64 ranked pairs — non-iterative, so the
    // oracle replays every round relationally (the ranked window, the
    // NOT-EXISTS conflict test, one list_reduce application). Round
    // count << merge count is the whole point: a 32k vocabulary at
    // batch=32 is ~1000 rounds instead of ~64k driver-loop jobs.
    "bpe_train_batched" -> ((s, d) =>
      graft.operators.BpeTrain.trainBatched(Tables.documents(s, d),
        "text", rounds = 3, batch = 8)),

    // ...and the batched trainer's APPLICATION half: segment by the
    // batched-learned merges, rank the corpus subword frequencies —
    // bpe_encode's twin over trainBatched's vocabulary
    "bpe_encode_batched" -> ((s, d) =>
      graft.operators.BpeTrain.subwordCountsBatched(
        Tables.documents(s, d), "text", rounds = 3, batch = 8, topK = 30)),

    // ...and the APPLICATION: segment every word into the 5 learned
    // subwords (the evolved vocabulary IS the segmentation) and rank
    // the corpus subword frequencies — what a tokenizer's vocab file
    // ships as. Still vocabulary-sized after the one corpus scan.
    "bpe_encode" -> ((s, d) =>
      graft.operators.BpeTrain.subwordCounts(
        Tables.documents(s, d), "text", 5, 30)),

    // collocation mining by LIFT (log-free PMI: observed/expected
    // adjacency ratio — products and one division only, so both
    // engines produce bit-identical doubles; a log would hang the gate
    // on libm last-ulp drift): unigram counts broadcast against the
    // observed-bigram table. 100 TB shape: the bigram groupBy shuffles
    // observed PAIRS (vocab-bounded), the unigram side is a broadcast,
    // and the corpus is read once.
    "colloc_lift" -> ((s, d) => {
      val tok = Tables.documents(s, d)
        .select(split(lower(col("text")), " ").as("w"))
      val pairs = tok.filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), " +
            "i -> struct(w[i-1] AS a, w[i] AS b))")).as("p"))
        .filter(length(col("p.a")) > 0 && length(col("p.b")) > 0)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("c_ab"))
      // the unigram table is consumed THREE times (total N + both
      // broadcast sides); staged once, the corpus is read once for it
      // instead of three times — at 100 TB that is the whole game
      val uni = staged(s, d, "unigrams")(
        Tables.documents(s, d)
          .select(explode(split(lower(col("text")), " ")).as("word"))
          .filter(length(col("word")) > 0)
          .groupBy("word").agg(count(lit(1)).as("c")))
      // total token count N rides the plan as a broadcast 1-row
      // aggregate instead of a driver collect: the collect was a whole
      // extra Spark job on EVERY query build (and a scan of the staged
      // unigram table); as a crossJoin the same long reaches the lift
      // arithmetic in-plan (sum of longs -> cast double, identical
      // value)
      val n = uni.agg(sum("c").as("n_total"))
      pairs.filter(col("c_ab") >= 5)
        .join(broadcast(uni.withColumnRenamed("word", "a")
          .withColumnRenamed("c", "c_a")), Seq("a"))
        .join(broadcast(uni.withColumnRenamed("word", "b")
          .withColumnRenamed("c", "c_b")), Seq("b"))
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("c_ab"),
          ((col("c_ab").cast("double") * col("n_total").cast("double")) /
            (col("c_a").cast("double") * col("c_b").cast("double")))
            .as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b")).limit(30)
    }),

    // vocabulary truncation: rank tokens by global frequency, keep the
    // top 40, report per-language OOV-token rate — the "how much does a
    // k-entry vocab cover" question behind every tokenizer size choice.
    // Only the top-k survive, so the selection is orderBy+limit — a
    // TakeOrderedAndProject that keeps k rows per partition and merges
    // k on the driver, never ranking the full vocabulary through one
    // task. The k-row vocab is then a legitimately tiny broadcast.
    "oov_rate" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(40)
        .select(col("tok"), lit(1).as("rank"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("rank").isNull, 1)).as("n_oov"),
          (count(when(col("rank").isNull, 1)).cast("double") /
            count(lit(1))).as("oov_rate"))
    }),

    // reproducible train/valid/test split: the first md5 byte of the
    // content buckets each doc 0..255 -> ~80/10/10 by threshold. Pure
    // map-side, no RNG state, stable under reshuffles/reruns — the
    // split survives pipeline re-executions byte-for-byte.
    "corpus_split" -> ((s, d) => {
      val bucket = conv(substring(md5(col("text").cast("binary")), 1, 2),
        16, 10).cast("long")
      Tables.documents(s, d)
        .select(col("lang"),
          when(bucket < 204, "train").when(bucket < 230, "valid")
            .otherwise("test").as("split"))
        .groupBy("lang", "split").agg(count(lit(1)).as("n_docs"))
    }),

    // resample-to-hourly + forward fill (the xarray `resample`/`ffill`
    // analog on event tables): a dense hourly spine per series joins
    // the sparse hourly aggregate and gaps carry the last observed
    // value forward. Spine generation is a 1-row-bounds broadcast;
    // the fill is ONE carry-forward window per series — parallelism is
    // the series count, so at scale the series key is an entity id
    // (sensor, user), not a 5-value category; bounded-gap fills use
    // the as-of join shape instead. Sums stay decimal-exact until one
    // final string->double round-trip.
    // hourly spike detection: flag hours whose event count exceeds
    // mean + 3 sigma of the trailing 24 observed hours, per event
    // type — the ops-monitoring shape of event analytics. Windows
    // partition by type (bounded series, never global); the moment
    // sums n/s1/s2 are INTEGER-valued, so mean/sigma are identical
    // division/sqrt chains on both engines (sqrt is correctly-rounded
    // IEEE) — the flag is bit-deterministic, no rounding hedge needed.
    "events_anomaly" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("hour_start")
        .rowsBetween(-24, -1)
      hourly
        .select(col("hour_start"), col("event_type"), col("cnt"),
          count(col("cnt")).over(w).as("n"),
          sum(col("cnt")).over(w).as("s1"),
          sum(col("cnt") * col("cnt")).over(w).as("s2"))
        .filter(col("n") >= 12)
        .select(col("hour_start"), col("event_type"), col("cnt"),
          (col("cnt") > col("s1") / col("n") + lit(3.0) *
            sqrt(greatest(col("s2") / col("n") -
              (col("s1") / col("n")) * (col("s1") / col("n")),
              lit(0.0)))).cast("long").as("spike"))
    }),

    // exact grouped median (no sketch), the histogram way: ONE
    // map-side-combinable agg collapses the corpus to (lang, length,
    // count) — bounded by DISTINCT lengths, not rows — and the rank
    // window walks that bounded histogram, never the data (ranking
    // raw rows per lang would be a single-task sort of a whole
    // language at 100 TB). The two middle ranks fall where the
    // running count first covers them; integer halving is
    // dyadic-exact.
    "median_by_lang" -> ((s, d) => {
      val hist = Tables.documents(s, d)
        .groupBy("lang", "n_chars").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.select(col("lang"), col("n_chars"),
        sum(col("cnt")).over(w).as("cum"),
        sum(col("cnt")).over(Window.partitionBy("lang")).as("n"))
      val lo = floor((col("n") + 1) / 2)
      val hi = floor((col("n") + 2) / 2)
      val vLo = cum.filter(col("cum") >= lo)
        .groupBy("lang").agg(min("n_chars").as("v_lo"), max("n").as("n"))
      val vHi = cum.filter(col("cum") >= hi)
        .groupBy("lang").agg(min("n_chars").as("v_hi"))
      vLo.join(vHi, "lang")
        .select(col("lang"),
          ((col("v_lo") + col("v_hi")) / 2.0).as("median_chars"),
          col("n").as("n_docs"))
    }),

    // semi-supervised label spreading over the near-dup graph: the
    // reviewed half's `source` labels propagate to their unlabeled
    // near-duplicates by exact integer majority vote (ties to the
    // smallest label, 2 fixed rounds) — the curation step that turns
    // a labeled slice into labels for everything it nearly
    // duplicates. Seeds never change; a node two hops from any seed
    // labels in round 2 via round-1 adoptees.
    "label_propagation" -> ((s, d) => {
      val pairs = stagedJaccardEdges(s, d)
      val sym = pairs.unionAll(
        pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      val seeds = Tables.documents(s, d).filter(col("doc_id") < 250)
        .select(col("doc_id"), col("source"))
      graft.operators.GraphOps
        .labelPropagate(sym, "doc_a", "doc_b", seeds,
          "doc_id", "source", 2)
        .select(col("id").cast("long").as("doc_id"), col("label"))
    }),

    // grouped multi-quantile, the histogram way (the median_by_lang
    // technique generalized): ONE map-side-combinable (lang, length,
    // count) aggregate, then all three quantile ranks walk the SAME
    // bounded histogram — a per-lang window over raw rows would be a
    // single-task sort of a whole language at 100 TB. Type-1 (lower)
    // quantiles: rank ceil(q*n) in pure integer arithmetic, so the
    // answers are exact longs — no interpolation doubles anywhere.
    "quantiles_by_lang" -> ((s, d) => {
      val hist = Tables.documents(s, d)
        .groupBy("lang", "n_chars").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist.select(col("lang"), col("n_chars"),
        sum(col("cnt")).over(w).as("cum"),
        sum(col("cnt")).over(Window.partitionBy("lang")).as("n"))
      // all three crossings read the SAME cumulative histogram in one
      // conditional-min pass — no joins, no recomputation (the first
      // join-per-rank version cost 3 histogram builds / 8 exchanges)
      def at(rankSql: String) =
        min(when(col("cum") >= expr(rankSql), col("n_chars")))
      cum.groupBy("lang").agg(
        at("(n + 3) div 4").as("p25"),
        at("(n + 1) div 2").as("p50"),
        at("(3 * n + 3) div 4").as("p75"))
    }),

    // CUSUM changepoint detection per user: the point where the
    // cumulative deviation from the user's mean peaks — the classic
    // drift/level-shift detector over metric streams. ONE shuffle
    // (partition by user) feeds all three windows. Exactness: the
    // running sum accumulates integer CENTS (exact under ANY
    // summation order — DuckDB's segment-tree window and Spark's
    // sequential fold would disagree in low bits on raw doubles), and
    // cusum_t = (S_t - t*mean)/100 is then a fixed double op chain;
    // the argmax tie-breaks (|cusum| desc, ts asc, event_id asc).
    "events_changepoint" -> ((s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      val wAll = Window.partitionBy("user_id")
      val st = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("c"))
        .select(col("user_id"), col("ts"), col("event_id"),
          sum(col("c")).over(wRun).cast("double").as("srun"),
          row_number().over(wOrd).as("rn"),
          sum(col("c")).over(wAll).cast("double").as("tot"),
          count(lit(1)).over(wAll).as("n"))
        .select(col("user_id"), col("ts"), col("event_id"), col("n"),
          ((col("srun") - col("rn") * (col("tot") / col("n"))) /
            lit(100.0)).as("cusum"))
      st.groupBy("user_id")
        .agg(max(struct(abs(col("cusum")).as("a"),
            (-unix_micros(col("ts"))).as("nt"),
            (-col("event_id")).as("ne"),
            col("ts").as("ts"), col("cusum").as("cp"))).as("m"),
          max(col("n")).as("n_events"))
        .select(col("user_id"), col("m.ts").as("cp_ts"),
          col("m.cp").as("cusum"), col("n_events"))
    }),

    // one row PER SESSION through Spark's native session_window — the
    // dynamic-gap sibling of the fixed window() aggregation and the
    // operator Structured Streaming uses for watermarked streaming
    // sessionization (events_sessions keeps the gaps-and-islands
    // per-user COUNTS; this emits the sessions themselves). Session
    // end = last event + gap by definition, which the oracle replays
    // as islands + INTERVAL arithmetic. One shuffle on user_id.
    "events_session_window" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "5 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))),

    "events_resample" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("value").cast(DecimalType(18, 6))).as("sv"))
      val bounds = ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val spine = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("hour"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(hourly, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          last(col("sv"), ignoreNulls = true).over(w)
            .cast("string").cast("double").as("v_ffill"))
    }),

    // exact-substring duplication (Lee et al. 2021, arXiv:2107.06499):
    // documents sharing long verbatim character runs surface by joining
    // their 30-char gram posting lists and counting shared grams per
    // pair. Grams present in more than 8 documents are dropped BEFORE
    // the pair join — the standard ubiquitous-boilerplate guard, and
    // the skew bound: with df <= 8 one gram contributes <= 28 pairs,
    // so no posting list can go quadratic (the role boundedBlockPairs
    // plays for block joins). Everything is equi-join + groupBy — at
    // 100 TB this is the canonical posting-list shuffle, keyed on the
    // 30-byte gram itself (narrow enough that hashing it first buys a
    // constant, not a complexity class; raw grams keep the DuckDB
    // oracle join bit-exact with zero collision caveat).
    "ngram_dup_spans" -> ((s, d) =>
      ngramDupSpans(Tables.documents(s, d), hashedGrams = false)),

    // heavy hitters with BOUNDED memory: a single-pass Misra–Gries
    // summary (64 mergeable counters) yields a candidate set guaranteed
    // to contain every token above n/65 of the corpus; the candidates
    // broadcast onto one exact counting pass restricted to them
    // (map-side hash agg over <= 64 keys), and the final threshold
    // total/40 (> n/65) makes the output EXACT no matter which extra
    // candidates the order-dependent summary carried — the LSH
    // candidate/verify contract applied to frequency. The full
    // vocabulary is never shuffled: the sketch is one row of state per
    // partition, the verify shuffles <= 64 keys of partial counts.
    "heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(words(col("text"))).as("token"))
      // the Misra-Gries sketch and the total token count fold in the
      // SAME single-group aggregate (formerly two separate corpus
      // explodes), and the total rides the candidate rows into the
      // confirm pass — 2 corpus passes total (sketch+count, exact
      // confirm), the information-theoretic minimum for exact heavy
      // hitters
      val cand = toks.agg(graft.functions.MisraGries
          .misra_gries(col("token"), 64).as("mg"),
          count(lit(1)).as("total"))
        .select(explode(col("mg")).as("token"), col("total"))
      toks.join(broadcast(cand), "token")
        .groupBy("token", "total").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 40 > col("total"))
        .select(col("token"), col("cnt"))
    }),

    // BM25 top-k retrieval for a fixed 3-term query. The idf keeps the
    // rank-preserving rational core (N - df + 0.5)/(df + 0.5) WITHOUT
    // the log wrap — same bit-exactness trade as tfidf_top_terms
    // (ln() is the one non-IEEE-pinned libm call between engines; the
    // per-term transform is monotone in df, and the cross-term sum is
    // our documented scoring function). Per-(doc,term) groups hold at
    // most one row, so each conditional SUM is exact, and the three
    // term scores add in FIXED order — the float chain is reproducible
    // on both engines. Top-k via orderBy+limit (TakeOrdered): no
    // corpus-sized window; rank is assigned over the k survivors only.
    "bm25_topk" -> ((s, d) => {
      val qt = Seq("spark", "stream", "join")
      val docs = Tables.documents(s, d)
      // decide with small rows (guide §8): for a FIXED 3-term query the
      // per-doc term frequencies are three map-side array counts, so
      // the whole per-(doc, term) join pipeline — tf explode + group,
      // df aggregate, tf⋈df⋈dl (two corpus-sized shuffles by doc_id) —
      // collapses to one scan emitting (doc_id, dl, tf0, tf1, tf2),
      // one 1-row global aggregate (n_docs, Σdl, df per term,
      // broadcast), and a map-side scoring pass. ZERO corpus shuffles;
      // the only ordering work is the same TakeOrdered top-10. The
      // float chain per term is kept operand-for-operand identical to
      // the join form, summed in the same fixed term order; docs with
      // no query term are filtered out exactly like the old inner
      // explode dropped them.
      val toks = split(lower(col("text")), " ")
      val base = docs.select(Seq(col("doc_id"),
        size(words(col("text"))).cast("long").as("dl")) ++
        qt.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === t)).cast("long").as(s"tf$i")
        }: _*)
      val statAggs = Seq(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("total")) ++
        qt.indices.map(i => sum(when(col(s"tf$i") > 0, 1L)).as(s"df$i"))
      val stats = base.agg(statAggs.head, statAggs.tail: _*)
      val avgdl = col("total").cast("double") / col("n_docs").cast("double")
      def idf(i: Int) =
        ((col("n_docs") - col(s"df$i")).cast("double") + lit(0.5)) /
          (col(s"df$i").cast("double") + lit(0.5))
      def tfc(i: Int) =
        (col(s"tf$i").cast("double") * lit(2.2)) /
          (col(s"tf$i").cast("double") + lit(1.2) *
            (lit(0.25) + (lit(0.75) * col("dl").cast("double")) / avgdl))
      val scores = qt.indices.map(i =>
        when(col(s"tf$i") > 0, idf(i) * tfc(i)).otherwise(lit(0.0)))
      val scored = base
        .filter(qt.indices.map(i => col(s"tf$i") > 0).reduce(_ || _))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), scores.reduce(_ + _).as("score"))
      val top = scored.orderBy(col("score").desc, col("doc_id")).limit(10)
      top.select(col("doc_id"), col("score"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long").as("rank"))
    })
  )

  /** DuckDB expression mirroring [[qualityExpr]] (dyadic weights). */
  private val qualitySql =
    """least((length(text) - length(replace(text, ' ', '')) + 1) / 100.0, 1.0) * 0.5
      |+ least((CAST(length(replace(text, ' ', '')) AS DOUBLE) /
      |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)) / 8.0,
      |    1.0) * 0.25
      |+ (CASE WHEN (length(' ' || text || ' ') -
      |     length(replace(' ' || text || ' ', ' the ', ' '))) / 4 > 0
      |   THEN 1.0 ELSE 0.0 END) * 0.25""".stripMargin

  /** LSH candidates -> verified pairs -> min-label components, as CTEs
    * (callers prepend WITH RECURSIVE; final CTE is `clusters`).
    * Mirrors [[jaccardPairs]] + GraphOps.connectedComponents.
    */
  /** The verified near-dup edge set (LSH candidates -> exact Jaccard
    * >= 0.4, symmetrized): `e(a, b)` — shared by the connected-
    * components oracle below and the PageRank oracle.
    */
  private val neardupEdgeSqlCte =
    s"""$sigSqlCte,
       |bands AS (
       |  SELECT doc_id, 0 AS band, sig0 || sig1 AS key FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, sig2 || sig3 AS key FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b FROM cand
       |  JOIN sig sa ON sa.doc_id = cand.doc_a
       |  JOIN sig sb ON sb.doc_id = cand.doc_b
       |  WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |    >= 0.4),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |      UNION SELECT doc_b, doc_a FROM pairs)""".stripMargin

  /** DSIR hashed-unigram importance weights (doc_id, weight) — shared
    * by `dsir_weights` (the weights themselves) and `dsir_resample`
    * (the upsampling materialization). See the dsir_weights query
    * comment for the bucket-ratio law and scale shape.
    */
  private def dsirWeightsDf(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(words(col("text"))).as("token"))
      .filter(length(col("token")) > 0)
    val bt = tok.select(col("doc_id"), col("lang"),
      ((length(col("token")) * 31 + ascii(col("token"))) % 64)
        .as("bucket"))
    // TWO token passes, each collapsing map-side (r15 reshape): the
    // ratio pass fuses the former separate corpus/target aggregates
    // into ONE groupBy(bucket) with a conditional sum — partial
    // aggregation folds the token stream to 64 rows per task before
    // its (tiny) shuffle — and the profile pass is the map-side-
    // combinable (doc, bucket) count. The round-14 single-pass form
    // (shared (doc, lang, bucket) aggregate, ratio table re-aggregated
    // off the same exchange via AQE reuse) measured 0.78-0.82x of the
    // two-pass shapes in the driver's runs: re-reading the corpus-
    // sized exchange for the ratio branch plus the extra AQE stage
    // costs more than one extra map-side-collapsing scan, locally and
    // — because the re-read is shuffle I/O of docs x buckets rows while
    // the scan pass never shuffles more than 64 rows per task — at
    // scale as well. sum(when(en, 1)) is NULL for a bucket no 'en'
    // token touches, exactly like the former left join's missing row.
    val ratios = bt.groupBy("bucket")
      .agg(count(lit(1)).as("c"),
        sum(when(col("lang") === "en", 1L)).as("t"))
      .select(col("bucket"),
        expr("((coalesce(t, 0L) + 1) * 1000000) div (c + 1)").as("r"))
    bt.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      .join(broadcast(ratios), "bucket")
      .groupBy("doc_id").agg(sum(col("n") * col("r")).as("weight"))
  }

  /** One integer PageRank round as SQL: `cur` from `prev` over the
    * shared `e`/`deg`/`n` CTEs — mirrors
    * [[graft.operators.GraphOps.pageRankInt]] exactly (85/100
    * damping, 10^6 micro-units).
    */
  private def prIterSql(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.id,
       |  CAST((15000000 + 85 * COALESCE(SUM(p.pr // d.deg), 0)) // 100
       |    AS BIGINT) AS pr
       |  FROM n LEFT JOIN e ON e.b = n.id
       |  LEFT JOIN $prev p ON p.id = e.a
       |  LEFT JOIN deg d ON d.a = e.a
       |  GROUP BY n.id)""".stripMargin

  /** DuckDB replay of [[dsirWeightsDf]], ending in `dw(doc_id,
    * weight)` — shared by the weights and resample oracles.
    */
  private val dsirSqlCte =
    """tokdw AS (
      |  SELECT doc_id, lang,
      |  unnest(string_split(lower(text), ' ')) AS token
      |  FROM documents),
      |btdw AS (
      |  SELECT doc_id, lang,
      |  (length(token)*31 + ascii(token)) % 64 AS bucket
      |  FROM tokdw WHERE length(token) > 0),
      |corpusdw AS (SELECT bucket, COUNT(*) AS c
      |             FROM btdw GROUP BY bucket),
      |targetdw AS (SELECT bucket, COUNT(*) AS t FROM btdw
      |             WHERE lang = 'en' GROUP BY bucket),
      |ratiosdw AS (
      |  SELECT corpusdw.bucket,
      |  ((COALESCE(t, 0) + 1) * 1000000) // (c + 1) AS r
      |  FROM corpusdw LEFT JOIN targetdw
      |  ON corpusdw.bucket = targetdw.bucket),
      |dbdw AS (SELECT doc_id, bucket, COUNT(*) AS n
      |         FROM btdw GROUP BY doc_id, bucket),
      |dw AS (SELECT dbdw.doc_id, CAST(SUM(n * r) AS BIGINT) AS weight
      |       FROM dbdw JOIN ratiosdw ON dbdw.bucket = ratiosdw.bucket
      |       GROUP BY dbdw.doc_id)""".stripMargin

  /** One label-propagation round as SQL: `cur` from `prev` over the
    * shared `e` CTE — mirrors
    * [[graft.operators.GraphOps.labelPropagate]] exactly (integer
    * votes, ties to the smallest label, seeds win via COALESCE).
    */
  private def lpIterSql(prev: String, cur: String): String =
    s"""v$cur AS (
       |  SELECT e.b AS id, l.label, COUNT(*) AS cnt
       |  FROM e JOIN $prev l ON l.id = e.a AND l.label IS NOT NULL
       |  GROUP BY e.b, l.label),
       |w$cur AS (
       |  SELECT id, label FROM (
       |    SELECT id, label, row_number() OVER (PARTITION BY id
       |      ORDER BY cnt DESC, label) AS rn
       |    FROM v$cur) t WHERE rn = 1),
       |$cur AS (
       |  SELECT p.id, COALESCE(p.label, w$cur.label) AS label
       |  FROM $prev p LEFT JOIN w$cur ON w$cur.id = p.id)""".stripMargin

  /** Analytic replay of the image fingerprint corpus + the brute-force
    * near-dup pair set: both fixture variants (v=0 original, v=1
    * re-encode = +v in the red channel law) decode AND 9x8-resample
    * analytically (the image_dhash_scaled arithmetic), hashes held as
    * unsigned 32-bit halves (2^63 would overflow a BIGINT sum), pairs
    * = every (a < b) combination hamming-tested over both halves.
    * Shared by image_dhash_pairs and image_dedup_pipeline.
    */
  private val dhashMediaSqlCte =
    """im AS (
      |  SELECT doc_id, v, doc_id * 2 + v AS media_id,
      |  16 + doc_id % 7 AS w, 12 + doc_id % 5 AS h
      |  FROM documents, (SELECT unnest([0, 1]) AS v)
      |  WHERE doc_id % 3 = 0),
      |ys AS (SELECT media_id, doc_id, v, w, h,
      |       unnest(generate_series(0, 7)) AS dy FROM im),
      |xs AS (SELECT media_id, doc_id, v, w, h, dy,
      |       unnest(generate_series(0, 7)) AS dx FROM ys),
      |gb AS (SELECT media_id, doc_id, v, dy * 8 + dx AS b,
      |  (((2*dy+1) * h) // 16) * w + (((2*dx+1) * w) // 18) AS p0,
      |  (((2*dy+1) * h) // 16) * w + (((2*(dx+1)+1) * w) // 18) AS p1
      |  FROM xs),
      |gr AS (SELECT media_id, b,
      |  (doc_id*7 + p0*3 + v) % 256 + (doc_id*11 + p0*5) % 256
      |    + (doc_id*13 + p0*7) % 256 AS g0,
      |  (doc_id*7 + p1*3 + v) % 256 + (doc_id*11 + p1*5) % 256
      |    + (doc_id*13 + p1*7) % 256 AS g1
      |  FROM gb),
      |hs AS (SELECT media_id,
      |  CAST(SUM(CASE WHEN b >= 32 AND g0 > g1
      |    THEN CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER)
      |    ELSE 0 END) AS BIGINT) AS hi,
      |  CAST(SUM(CASE WHEN b < 32 AND g0 > g1
      |    THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
      |    ELSE 0 END) AS BIGINT) AS lo
      |  FROM gr GROUP BY media_id),
      |prs AS (
      |  SELECT * FROM (
      |    SELECT a.media_id AS media_a, b.media_id AS media_b,
      |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
      |      AS BIGINT) AS hamming
      |    FROM hs a JOIN hs b ON a.media_id < b.media_id) t
      |  WHERE hamming <= 3)""".stripMargin

  private val clustersSqlCte =
    s"""$neardupEdgeSqlCte,
       |reach(id, r) AS (
       |  SELECT a, a FROM e
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id),
       |clusters AS (
       |  SELECT CAST(id AS BIGINT) AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
       |  FROM reach GROUP BY id)""".stripMargin

  /** One unrolled Lloyd iteration over the embeddings (k=4, seed =
    * the 4 lowest vec_ids): e/c0 -> assignment d1/a1 -> fixed-point
    * means m -> trained centroids c1 -> re-scored distances d2
    * (carrying v for consumers that need the vectors back).
    * Mirrors KMeans.assign/update exactly — see the kmeans_embed
    * comment for the determinism argument.
    */
  private val kmeansCte =
    """e AS (
      |  SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |c0 AS (SELECT id AS cid, v AS cv FROM e ORDER BY id LIMIT 4),
      |d1 AS (
      |  SELECT e.id, e.v, c0.cid,
      |  (list_aggregate(list_transform(e.v, x -> x*x), 'sum')
      |   - 2 * list_aggregate(list_transform(list_zip(e.v, c0.cv),
      |       z -> z[1]*z[2]), 'sum'))
      |   + list_aggregate(list_transform(c0.cv, x -> x*x), 'sum') AS dist2
      |  FROM e, c0),
      |a1 AS (
      |  SELECT id, v, cid AS cluster FROM (
      |    SELECT id, v, cid,
      |    row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
      |    FROM d1) t WHERE rn = 1),
      |ex AS (
      |  SELECT cluster, unnest(range(len(v))) AS pos, unnest(v) AS x
      |  FROM a1),
      |m AS (
      |  SELECT cluster AS cid, pos,
      |  SUM(floor(x * 1048576.0 + 0.5)) / (COUNT(*) * 1048576.0) AS c
      |  FROM ex GROUP BY cluster, pos),
      |c1 AS (SELECT cid, list(c ORDER BY pos) AS cv FROM m GROUP BY cid),
      |d2 AS (
      |  SELECT e.id, e.v, c1.cid,
      |  (list_aggregate(list_transform(e.v, x -> x*x), 'sum')
      |   - 2 * list_aggregate(list_transform(list_zip(e.v, c1.cv),
      |       z -> z[1]*z[2]), 'sum'))
      |   + list_aggregate(list_transform(c1.cv, x -> x*x), 'sum') AS dist2
      |  FROM e, c1)""".stripMargin

  /** DuckDB replay of [[graft.operators.SimilarityOps.pqTrain]] /
    * `pqEncode`: m=2 subspaces (v[1:32], v[33:64]), k=16 seeded from
    * vec_id 0..15, one fixed-point Lloyd step — the [[kmeansCte]]
    * discipline per subspace. Produces c1pq(sub, cid, cv) and
    * codespq(id, sub, code).
    */
  /** DuckDB replay of [[graft.operators.SimilarityOps.sq8Train]] +
    * sq8Encode: per-dim min/max over parallel unnest, quantizer as
    * dim-length lists, codes via the identical floor((x−lo)/s + 0.5)
    * chain. All folds are listwise (list_aggregate) so summation
    * order matches Spark's sequential array aggregate.
    */
  private val sq8Cte =
    """sq8e AS (
      |  SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sq8x AS (
      |  SELECT id, unnest(range(len(v))) AS pos, unnest(v) AS x FROM sq8e),
      |sq8d AS (
      |  SELECT pos, MIN(x) AS lo, (MAX(x) - MIN(x)) / 255.0 AS s
      |  FROM sq8x GROUP BY pos),
      |sq8l AS (
      |  SELECT list(lo ORDER BY pos) AS lo, list(s ORDER BY pos) AS s
      |  FROM sq8d),
      |sq8c AS (
      |  SELECT id, v,
      |  list_transform(list_zip(v, lo, s), z ->
      |    CASE WHEN z[3] = 0 THEN 0
      |    ELSE CAST(floor((z[1] - z[2]) / z[3] + 0.5) AS INT) END) AS codes
      |  FROM sq8e, sq8l)""".stripMargin

  private val pqCte =
    """epq AS (
      |  SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |espq AS (
      |  SELECT id, 0 AS sub, v[1:32] AS sv FROM epq
      |  UNION ALL
      |  SELECT id, 1 AS sub, v[33:64] AS sv FROM epq),
      |c0pq AS (SELECT sub, id AS cid, sv AS cv FROM espq WHERE id < 16),
      |d1pq AS (
      |  SELECT e.id, e.sub, e.sv, c.cid,
      |  (list_aggregate(list_transform(e.sv, x -> x*x), 'sum')
      |   - 2 * list_aggregate(list_transform(list_zip(e.sv, c.cv),
      |       z -> z[1]*z[2]), 'sum'))
      |   + list_aggregate(list_transform(c.cv, x -> x*x), 'sum') AS dist2
      |  FROM espq e JOIN c0pq c ON e.sub = c.sub),
      |a1pq AS (
      |  SELECT id, sub, sv, cid AS cluster FROM (
      |    SELECT id, sub, sv, cid,
      |    row_number() OVER (PARTITION BY id, sub ORDER BY dist2, cid) AS rn
      |    FROM d1pq) t WHERE rn = 1),
      |expq AS (
      |  SELECT sub, cluster, unnest(range(len(sv))) AS pos, unnest(sv) AS x
      |  FROM a1pq),
      |mpq AS (
      |  SELECT sub, cluster AS cid, pos,
      |  SUM(floor(x * 1048576.0 + 0.5)) / (COUNT(*) * 1048576.0) AS c
      |  FROM expq GROUP BY sub, cluster, pos),
      |c1pq AS (SELECT sub, cid, list(c ORDER BY pos) AS cv
      |         FROM mpq GROUP BY sub, cid),
      |d2pq AS (
      |  SELECT e.id, e.sub, c.cid,
      |  (list_aggregate(list_transform(e.sv, x -> x*x), 'sum')
      |   - 2 * list_aggregate(list_transform(list_zip(e.sv, c.cv),
      |       z -> z[1]*z[2]), 'sum'))
      |   + list_aggregate(list_transform(c.cv, x -> x*x), 'sum') AS dist2
      |  FROM espq e JOIN c1pq c ON e.sub = c.sub),
      |codespq AS (
      |  SELECT id, sub, cid AS code FROM (
      |    SELECT id, sub, cid,
      |    row_number() OVER (PARTITION BY id, sub ORDER BY dist2, cid) AS rn
      |    FROM d2pq) t WHERE rn = 1)""".stripMargin

  /** DuckDB replay of [[simhashDf]]: hashed(doc_id, h) -> ssig(doc_id,
    * simhash). The banded-pairs oracle replays the 60-bit signature via
    * [[simhash60SqlCte]] instead.
    */
  private val simhashSqlCte: String = {
    val hexHi = "('8','9','a','b','c','d','e','f')"
    val bits = (0 until 16).map { p =>
      s"""CASE WHEN list_aggregate(list_transform(h,
         |x -> CASE WHEN substr(x, ${p + 1}, 1) IN $hexHi
         |THEN 1 ELSE -1 END), 'sum') > 0
         |THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""hashed AS (
       |  SELECT doc_id,
       |  list_transform(string_split(lower(text), ' '), t -> md5(t)) AS h
       |  FROM documents),
       |ssig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |         FROM hashed)""".stripMargin
  }

  /** DuckDB replay of [[graft.functions.SimHash64]]: bit p of the
    * 60-bit signature votes on bit (p % 4) of md5-hex nibble (p / 4).
    * ssig60(doc_id, simhash).
    */
  private val simhash60SqlCte: String = {
    val bits = (0 until 60).map { p =>
      val nib = s"(strpos('0123456789abcdef', substr(x, ${p / 4 + 1}, 1)) - 1)"
      s"""CASE WHEN list_aggregate(list_transform(h,
         |x -> CASE WHEN (($nib // ${1 << (p % 4)}) % 2) = 1
         |THEN 1 ELSE -1 END), 'sum') > 0
         |THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""hashed60 AS (
       |  SELECT doc_id,
       |  list_transform(string_split(lower(text), ' '), t -> md5(t)) AS h
       |  FROM documents),
       |ssig60 AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash
       |           FROM hashed60)""".stripMargin
  }

  private val annIvfOracle: String =
    """WITH e AS (
      |  SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
      |scored AS (
      |  SELECT e.id, e.v, c.cid,
      |  list_aggregate(list_transform(list_zip(e.v, c.cv), z -> z[1]*z[2]),
      |    'sum') / sqrt(list_aggregate(list_transform(c.cv, x -> x*x),
      |    'sum')) AS score
      |  FROM e, c WHERE e.id >= 8),
      |assigned AS (
      |  SELECT id, v, cid AS bucket FROM (
      |    SELECT id, v, cid,
      |    row_number() OVER (PARTITION BY id ORDER BY score DESC, cid) AS rn
      |    FROM scored) t WHERE rn = 1),
      |p AS (SELECT bucket AS pb, v AS pv FROM assigned WHERE id = 8)
      |SELECT a.id AS vec_id,
      |list_aggregate(list_transform(list_zip(a.v, p.pv), z -> z[1]*z[2]),
      |  'sum') / (sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum'))
      |  * sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum')))
      |  AS cosine
      |FROM assigned a, p
      |WHERE a.bucket = p.pb AND a.id <> 8
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** Multi-probe variant of [[annIvfOracle]]: cell selection is an
    * argtop-3 over the codebook with the same dot(pv,c)/|c| score
    * (sequential double folds, bit-identical across engines), then the
    * exact scoring runs over the union of those cells.
    */
  private val annIvfMultiProbeOracle: String =
    """WITH e AS (
      |  SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
      |p AS (SELECT v AS pv FROM e WHERE id = 8),
      |cells AS (
      |  SELECT cid FROM (
      |    SELECT c.cid,
      |    list_aggregate(list_transform(list_zip(c.cv, p.pv),
      |      z -> z[1]*z[2]), 'sum') /
      |      sqrt(list_aggregate(list_transform(c.cv, x -> x*x), 'sum'))
      |      AS score
      |    FROM c, p) t
      |  ORDER BY score DESC, cid LIMIT 3),
      |scored AS (
      |  SELECT e.id, e.v, c.cid,
      |  list_aggregate(list_transform(list_zip(e.v, c.cv), z -> z[1]*z[2]),
      |    'sum') / sqrt(list_aggregate(list_transform(c.cv, x -> x*x),
      |    'sum')) AS score
      |  FROM e, c WHERE e.id >= 8),
      |assigned AS (
      |  SELECT id, v, cid AS bucket FROM (
      |    SELECT id, v, cid,
      |    row_number() OVER (PARTITION BY id ORDER BY score DESC, cid) AS rn
      |    FROM scored) t WHERE rn = 1)
      |SELECT a.id AS vec_id,
      |list_aggregate(list_transform(list_zip(a.v, p.pv), z -> z[1]*z[2]),
      |  'sum') / (sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum'))
      |  * sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum')))
      |  AS cosine
      |FROM assigned a, p
      |WHERE a.bucket IN (SELECT cid FROM cells) AND a.id <> 8
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  // the multi-probe oracle minus the tombstoned ids: deletes remove
  // CANDIDATES only (the codebook rows 0..7 are never deleted, so
  // cell ranking is untouched) — shared by ann_ivf_deleted (masked)
  // and ann_ivf_purged (physically rewritten), proving both paths
  // answer as if the rows never existed
  private val annIvfDeletedOracle: String = {
    val derived = annIvfMultiProbeOracle.replace(
      "WHERE a.bucket IN (SELECT cid FROM cells) AND a.id <> 8",
      "WHERE a.bucket IN (SELECT cid FROM cells) AND a.id <> 8\n" +
        "AND a.id NOT BETWEEN 100 AND 299")
    // replace() on a reworded base would silently no-op and gate the
    // delete queries against the UN-deleted oracle — fail loudly here
    require(derived != annIvfMultiProbeOracle,
      "annIvfDeletedOracle: WHERE-clause anchor no longer matches the " +
        "multi-probe oracle — update the derivation")
    derived
  }

  private val annIvfBatchOracle: String =
      """WITH e AS (
        |  SELECT vec_id AS id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 8),
        |p AS (SELECT id AS pid, v AS pv FROM e WHERE id IN (8, 9, 10)),
        |cellscores AS (
        |  SELECT p.pid, c.cid,
        |  list_aggregate(list_transform(list_zip(c.cv, p.pv),
        |    z -> z[1]*z[2]), 'sum') /
        |    sqrt(list_aggregate(list_transform(c.cv, x -> x*x), 'sum'))
        |    AS score
        |  FROM p, c),
        |probecells AS (
        |  SELECT pid, cid FROM (
        |    SELECT pid, cid, row_number() OVER (PARTITION BY pid
        |      ORDER BY score DESC, cid) AS rn
        |    FROM cellscores) t WHERE rn <= 2),
        |scored AS (
        |  SELECT e.id, e.v, c.cid,
        |  list_aggregate(list_transform(list_zip(e.v, c.cv),
        |    z -> z[1]*z[2]), 'sum') /
        |    sqrt(list_aggregate(list_transform(c.cv, x -> x*x), 'sum'))
        |    AS score
        |  FROM e, c WHERE e.id >= 8),
        |assigned AS (
        |  SELECT id, v, cid AS bucket FROM (
        |    SELECT id, v, cid,
        |    row_number() OVER (PARTITION BY id
        |      ORDER BY score DESC, cid) AS rn
        |    FROM scored) t WHERE rn = 1),
        |cand AS (
        |  SELECT pc.pid, a.id,
        |  list_aggregate(list_transform(list_zip(a.v, p.pv),
        |    z -> z[1]*z[2]), 'sum') /
        |    (sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum')) *
        |     sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum')))
        |    AS cosine
        |  FROM assigned a
        |  JOIN probecells pc ON a.bucket = pc.cid
        |  JOIN p ON p.pid = pc.pid
        |  WHERE a.id <> pc.pid)
        |SELECT pid AS probe_id, id AS vec_id, cosine FROM (
        |  SELECT pid, id, cosine, row_number() OVER (PARTITION BY pid
        |    ORDER BY cosine DESC, id) AS rn
        |  FROM cand) t WHERE rn <= 5""".stripMargin

  /** Fresh IVF build at the RETRAINED codebook: live rows are ids >= 8
    * (build excluded the 8 stand-in codebook rows from data), the new
    * codebook is one fixed-point Lloyd round over them seeded from the
    * 4 lowest live ids (the [[kmeansCte]] discipline), assignment and
    * cell ranking use the one IVF scoring rule (dot(v,c)/|c|, ties to
    * the lowest cid), probe = id 8, nprobe = 2. What
    * `retrainIvfIndex` must be indistinguishable from.
    */
  private val annIvfRetrainedOracle: String =
    """WITH e AS (
      |  SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id >= 8),
      |c0 AS (SELECT id AS cid, v AS cv FROM e ORDER BY id LIMIT 4),
      |d1 AS (
      |  SELECT e.id, e.v, c0.cid,
      |  (list_aggregate(list_transform(e.v, x -> x*x), 'sum')
      |   - 2 * list_aggregate(list_transform(list_zip(e.v, c0.cv),
      |       z -> z[1]*z[2]), 'sum'))
      |   + list_aggregate(list_transform(c0.cv, x -> x*x), 'sum') AS dist2
      |  FROM e, c0),
      |a1 AS (
      |  SELECT id, v, cid AS cluster FROM (
      |    SELECT id, v, cid,
      |    row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
      |    FROM d1) t WHERE rn = 1),
      |ex AS (
      |  SELECT cluster, unnest(range(len(v))) AS pos, unnest(v) AS x
      |  FROM a1),
      |m AS (
      |  SELECT cluster AS cid, pos,
      |  SUM(floor(x * 1048576.0 + 0.5)) / (COUNT(*) * 1048576.0) AS c
      |  FROM ex GROUP BY cluster, pos),
      |c1 AS (SELECT cid, list(c ORDER BY pos) AS cv FROM m GROUP BY cid),
      |s2 AS (
      |  SELECT e.id, e.v, c1.cid,
      |  list_aggregate(list_transform(list_zip(e.v, c1.cv),
      |    z -> z[1]*z[2]), 'sum') /
      |    sqrt(list_aggregate(list_transform(c1.cv, x -> x*x), 'sum'))
      |    AS score
      |  FROM e, c1),
      |assigned AS (
      |  SELECT id, v, cid AS bucket FROM (
      |    SELECT id, v, cid,
      |    row_number() OVER (PARTITION BY id ORDER BY score DESC, cid) AS rn
      |    FROM s2) t WHERE rn = 1),
      |p AS (SELECT v AS pv FROM e WHERE id = 8),
      |cells AS (
      |  SELECT cid FROM (
      |    SELECT c1.cid,
      |    list_aggregate(list_transform(list_zip(c1.cv, p.pv),
      |      z -> z[1]*z[2]), 'sum') /
      |      sqrt(list_aggregate(list_transform(c1.cv, x -> x*x), 'sum'))
      |      AS score
      |    FROM c1, p) t
      |  ORDER BY score DESC, cid LIMIT 2)
      |SELECT a.id AS vec_id,
      |list_aggregate(list_transform(list_zip(a.v, p.pv), z -> z[1]*z[2]),
      |  'sum') / (sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum'))
      |  * sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum')))
      |  AS cosine
      |FROM assigned a, p
      |WHERE a.bucket IN (SELECT cid FROM cells) AND a.id <> 8
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** The hot-cell-split replay: build assignment (a0), hot = the
    * max-count bucket(s), per-cell 1-round sub-k-means seeded by the 2
    * lowest in-cell ids (dist2 argmin ties to the lowest seed, then
    * the micro-unit fixed-point means — the [[KMeans]] laws), children
    * renumbered 7 + hi·2 + rank(seed), hot rows re-assigned by
    * dot/|c| (ties to the lowest child), and the nprobe=3 multi-probe
    * run against the post-split codebook. Every step is the same
    * arithmetic the engine executes, so the gate hash-matches.
    */
  private val annIvfSplitOracle: String =
    """WITH e AS (
      |  SELECT vec_id AS id,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id >= 8),
      |c0 AS (
      |  SELECT vec_id AS cid,
      |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      |  FROM embeddings WHERE vec_id < 8),
      |s0 AS (
      |  SELECT e.id, e.v, c0.cid,
      |  list_aggregate(list_transform(list_zip(e.v, c0.cv),
      |    z -> z[1]*z[2]), 'sum') /
      |    sqrt(list_aggregate(list_transform(c0.cv, x -> x*x), 'sum'))
      |    AS score
      |  FROM e, c0),
      |a0 AS (
      |  SELECT id, v, cid AS bucket FROM (
      |    SELECT id, v, cid,
      |    row_number() OVER (PARTITION BY id ORDER BY score DESC, cid) AS rn
      |    FROM s0) t WHERE rn = 1),
      |cnt AS (SELECT bucket, COUNT(*) AS n FROM a0 GROUP BY bucket),
      |hot AS (SELECT bucket FROM cnt WHERE n = (SELECT MAX(n) FROM cnt)),
      |hr AS (SELECT bucket, row_number() OVER (ORDER BY bucket) - 1 AS hi
      |       FROM hot),
      |hrows AS (SELECT a0.id, a0.v, a0.bucket FROM a0
      |          JOIN hot USING (bucket)),
      |seeds AS (
      |  SELECT bucket, id AS scid, v AS scv FROM (
      |    SELECT bucket, id, v,
      |    row_number() OVER (PARTITION BY bucket ORDER BY id) AS rn
      |    FROM hrows) t WHERE rn <= 2),
      |d1 AS (
      |  SELECT h.bucket, h.id, h.v, s.scid,
      |  (list_aggregate(list_transform(h.v, x -> x*x), 'sum')
      |   - 2 * list_aggregate(list_transform(list_zip(h.v, s.scv),
      |       z -> z[1]*z[2]), 'sum'))
      |   + list_aggregate(list_transform(s.scv, x -> x*x), 'sum') AS dist2
      |  FROM hrows h JOIN seeds s ON s.bucket = h.bucket),
      |a1 AS (
      |  SELECT bucket, id, v, scid FROM (
      |    SELECT bucket, id, v, scid,
      |    row_number() OVER (PARTITION BY id ORDER BY dist2, scid) AS rn
      |    FROM d1) t WHERE rn = 1),
      |ex AS (
      |  SELECT bucket, scid, unnest(range(len(v))) AS pos, unnest(v) AS x
      |  FROM a1),
      |m AS (
      |  SELECT bucket, scid, pos,
      |  SUM(floor(x * 1048576.0 + 0.5)) / (COUNT(*) * 1048576.0) AS c
      |  FROM ex GROUP BY bucket, scid, pos),
      |c1 AS (SELECT bucket, scid, list(c ORDER BY pos) AS cv
      |       FROM m GROUP BY bucket, scid),
      |nc AS (
      |  SELECT c1.bucket, c1.scid,
      |  7 + hr.hi * 2 +
      |    row_number() OVER (PARTITION BY c1.bucket ORDER BY c1.scid)
      |    AS ncid, c1.cv
      |  FROM c1 JOIN hr ON hr.bucket = c1.bucket),
      |s2 AS (
      |  SELECT h.id, h.v, nc.ncid,
      |  list_aggregate(list_transform(list_zip(h.v, nc.cv),
      |    z -> z[1]*z[2]), 'sum') /
      |    sqrt(list_aggregate(list_transform(nc.cv, x -> x*x), 'sum'))
      |    AS score
      |  FROM hrows h JOIN nc ON nc.bucket = h.bucket),
      |a2 AS (
      |  SELECT id, v, ncid AS bucket FROM (
      |    SELECT id, v, ncid,
      |    row_number() OVER (PARTITION BY id ORDER BY score DESC, ncid) AS rn
      |    FROM s2) t WHERE rn = 1),
      |final AS (
      |  SELECT id, v, bucket FROM a0
      |  WHERE bucket NOT IN (SELECT bucket FROM hot)
      |  UNION ALL SELECT id, v, bucket FROM a2),
      |cb1 AS (
      |  SELECT cid, cv FROM c0
      |  WHERE cid NOT IN (SELECT bucket FROM hot)
      |  UNION ALL SELECT ncid AS cid, cv FROM nc),
      |p AS (SELECT v AS pv FROM e WHERE id = 8),
      |cells AS (
      |  SELECT cid FROM (
      |    SELECT cb1.cid,
      |    list_aggregate(list_transform(list_zip(cb1.cv, p.pv),
      |      z -> z[1]*z[2]), 'sum') /
      |      sqrt(list_aggregate(list_transform(cb1.cv, x -> x*x), 'sum'))
      |      AS score
      |    FROM cb1, p) t
      |  ORDER BY score DESC, cid LIMIT 3)
      |SELECT a.id AS vec_id,
      |list_aggregate(list_transform(list_zip(a.v, p.pv), z -> z[1]*z[2]),
      |  'sum') / (sqrt(list_aggregate(list_transform(a.v, x -> x*x), 'sum'))
      |  * sqrt(list_aggregate(list_transform(p.pv, x -> x*x), 'sum')))
      |  AS cosine
      |FROM final a, p
      |WHERE a.bucket IN (SELECT cid FROM cells) AND a.id <> 8
      |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** The batch-probe oracle extended through the majority vote: top-5
    * neighbor ids per probe become a (probe, label) vote table, winner
    * by (votes DESC, label). Derived from [[annIvfBatchOracle]] so the
    * retrieval replay can never drift between the two gates.
    */
  private val annKnnLabelOracle: String = {
    val derived = annIvfBatchOracle.replace(
      "\nSELECT pid AS probe_id, id AS vec_id, cosine FROM (",
      ",\ntopk AS (\n  SELECT pid, id FROM (")
      .replace(
        "  FROM cand) t WHERE rn <= 5",
        """  FROM cand) t WHERE rn <= 5),
          |lbl AS (
          |  SELECT t.pid, e2.label FROM topk t
          |  JOIN embeddings e2 ON e2.vec_id = t.id),
          |v AS (SELECT pid, label, CAST(COUNT(*) AS BIGINT) AS votes
          |      FROM lbl GROUP BY pid, label)
          |SELECT pid AS probe_id, label, votes FROM (
          |  SELECT pid, label, votes, row_number() OVER (PARTITION BY pid
          |    ORDER BY votes DESC, label) AS rn FROM v) t
          |WHERE rn = 1""".stripMargin)
    // a reworded base would make both replaces silent no-ops and gate
    // the vote against the raw batch output — fail loudly instead
    require(derived != annIvfBatchOracle && derived.contains("topk AS"),
      "annKnnLabelOracle: batch-oracle anchors no longer match — " +
        "update the derivation")
    derived
  }

  val oracleSql: ListMap[String, String] = ListMap(
    "ann_knn_label" -> annKnnLabelOracle,
    "ann_ivf_retrained" -> annIvfRetrainedOracle,
    "ann_ivf_split" -> annIvfSplitOracle,
    "ann_ivf_multiprobe" -> annIvfMultiProbeOracle,
    "ann_ivf_batch" -> annIvfBatchOracle,
    // from-index batch == one-shot batch bit for bit (same scoring
    // rule, same tie-breaks; only the physical scan differs)
    "ann_ivf_index_batch" -> annIvfBatchOracle,
    // physical plan differs (partition-pruned index scan), answer
    // does not: one oracle serves both — same as ann_ivf_bucketed
    "ann_ivf_bucketed_multiprobe" -> annIvfMultiProbeOracle,
    // incremental build == full rebuild over the union, so the
    // one-shot multi-probe oracle serves verbatim — the hash gate IS
    // the rebuild-equivalence proof
    "ann_ivf_incremental" -> annIvfMultiProbeOracle,
    // build + 2 appends + compaction preserves content row-for-row,
    // so the one-shot multi-probe oracle serves verbatim
    "ann_ivf_compacted" -> annIvfMultiProbeOracle,
    "ann_ivf_deleted" -> annIvfDeletedOracle,
    "ann_ivf_purged" -> annIvfDeletedOracle,
    // vector probe: same cells and scoring, minus the self-exclusion
    // (the probe is a request-time vector, not a stored row)
    "ann_ivf_vector" ->
      annIvfMultiProbeOracle.replace(" AND a.id <> 8", ""),
    "vocab_coverage" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM toks GROUP BY token),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks),
        |r AS (SELECT token, cnt,
        |  CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT)
        |    AS vocab_size,
        |  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token) AS BIGINT)
        |    AS covered
        |  FROM c)
        |SELECT vocab_size, covered, total FROM r, t
        |WHERE covered * 100 >= total * 95
        |ORDER BY vocab_size LIMIT 1""".stripMargin,
    "dsir_weights" ->
      s"""WITH $dsirSqlCte
         |SELECT doc_id, weight FROM dw""".stripMargin,
    // integer copy counts (mean = integer div of the weight total;
    // copies = 1 + least(weight // mean, 3)) explode via
    // generate_series — the oracle materializes the same resampled
    // rows and aggregates them identically
    "dsir_resample" ->
      s"""WITH $dsirSqlCte,
         |mwq AS (SELECT CAST(SUM(weight) AS BIGINT)
         |        // COUNT(*) AS mw FROM dw),
         |cpq AS (SELECT doc_id,
         |        CAST(1 + LEAST(weight // mw, 3) AS BIGINT) AS copies
         |        FROM dw, mwq),
         |exq AS (SELECT d.lang, cpq.copies,
         |        unnest(generate_series(1, cpq.copies)) AS k
         |        FROM cpq JOIN documents d ON d.doc_id = cpq.doc_id)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |CAST(COUNT(CASE WHEN copies > 1 AND k = 1 THEN 1 END) AS BIGINT)
         |  AS n_upsampled
         |FROM exq GROUP BY lang""".stripMargin,
    "neardup_topk" ->
      s"""WITH $sigSqlCte,
         |bands AS (
         |  SELECT doc_id, 0 AS band, sig0 || sig1 AS key FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, sig2 || sig3 AS key FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |undirected AS (
         |  SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |    (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
         |    AS jaccard
         |  FROM cand
         |  JOIN sig sa ON sa.doc_id = cand.doc_a
         |  JOIN sig sb ON sb.doc_id = cand.doc_b),
         |directed AS (
         |  SELECT doc_a AS src, doc_b AS dst, jaccard FROM undirected
         |  WHERE jaccard >= 0.2
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst, jaccard FROM undirected
         |  WHERE jaccard >= 0.2)
         |SELECT src, dst, jaccard FROM (
         |  SELECT src, dst, jaccard,
         |  row_number() OVER (PARTITION BY src
         |    ORDER BY jaccard DESC, dst) AS rn
         |  FROM directed) t WHERE rn <= 2""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS h, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "dedup_fingerprint" ->
      """SELECT md5(array_to_string(list_sort(list_distinct(
        |  string_split(lower(text), ' '))), ' ')) AS fp,
        |CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    // DuckDB subscripts are 1-based; (pos-1)//10 matches Spark's
    // 0-based posexplode block index
    "para_dedup" ->
      """WITH tokpos AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |blocks AS (
        |  SELECT doc_id, CAST((pos - 1) // 10 AS BIGINT) AS b,
        |         string_agg(tok, ' ' ORDER BY pos) AS para
        |  FROM tokpos GROUP BY 1, 2),
        |winners AS (
        |  SELECT para, min(doc_id * 1000000 + b) AS win
        |  FROM blocks GROUP BY para),
        |kept AS (
        |  SELECT bl.doc_id, bl.b, bl.para FROM blocks bl JOIN winners w
        |  ON bl.para = w.para AND bl.doc_id * 1000000 + bl.b = w.win)
        |SELECT doc_id, string_agg(para, ' ' ORDER BY b) AS clean_text,
        |       CAST(COUNT(*) AS BIGINT) AS n_kept
        |FROM kept GROUP BY doc_id""".stripMargin,
    "dedup_within_doc" ->
      """WITH tokpos AS (
        |  SELECT doc_id,
        |         unnest(string_split(text, ' ')) AS tok,
        |         generate_subscripts(string_split(text, ' '), 1) AS pos
        |  FROM documents),
        |blocks AS (
        |  SELECT doc_id, CAST((pos - 1) // 10 AS BIGINT) AS b,
        |         string_agg(tok, ' ' ORDER BY pos) AS para
        |  FROM tokpos GROUP BY 1, 2),
        |firsts AS (
        |  SELECT doc_id, b, para,
        |         min(b) OVER (PARTITION BY doc_id, para) AS fb
        |  FROM blocks)
        |SELECT doc_id, string_agg(para, ' ' ORDER BY b) AS clean_text,
        |       CAST(COUNT(*) AS BIGINT) AS n_kept
        |FROM firsts WHERE b = fb GROUP BY doc_id""".stripMargin,
    "minhash_signature" ->
      s"""WITH $sigSqlCte
         |SELECT doc_id, sig0, sig1, sig2, sig3 FROM sig""".stripMargin,
    "lsh_candidate_pairs" ->
      s"""WITH $sigSqlCte,
         |bands AS (
         |  SELECT doc_id, 0 AS band, sig0 || sig1 AS key FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, sig2 || sig3 AS key FROM sig)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""".stripMargin,
    "minhash_containment" ->
      s"""WITH $sigSqlCte,
         |bands AS (
         |  SELECT doc_id, 0 AS band, sig0 || sig1 AS key FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, sig2 || sig3 AS key FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, cont_a, cont_b FROM (
         |  SELECT doc_a, doc_b,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sa.sh)
         |    AS cont_a,
         |  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) / len(sb.sh)
         |    AS cont_b
         |  FROM cand
         |  JOIN sig sa ON sa.doc_id = cand.doc_a
         |  JOIN sig sb ON sb.doc_id = cand.doc_b) x
         |WHERE greatest(cont_a, cont_b) >= 0.5""".stripMargin,
    "neardup_jaccard" ->
      s"""WITH $sigSqlCte,
         |bands AS (
         |  SELECT doc_id, 0 AS band, sig0 || sig1 AS key FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, sig2 || sig3 AS key FROM sig),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |  (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
         |  AS jaccard
         |FROM cand
         |JOIN sig sa ON sa.doc_id = cand.doc_a
         |JOIN sig sb ON sb.doc_id = cand.doc_b
         |WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
         |  (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
         |  >= 0.4""".stripMargin,
    // components as a recursive CTE: reach(id, r) = r reachable from id
    // over the symmetric pair graph; cluster = MIN over reachables =
    // exactly the min-label fixpoint the Spark side converges to
    "dedup_clusters" ->
      s"""WITH RECURSIVE $clustersSqlCte
         |SELECT doc_id, cluster FROM clusters""".stripMargin,
    // three unrolled integer power-iteration rounds over the shared
    // edge CTE; `//` == Spark's `div` on positive longs, sums of
    // longs are order-free — bit-exact across engines
    "pagerank_neardup" ->
      s"""WITH $neardupEdgeSqlCte,
         |deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg
         |        FROM e GROUP BY a),
         |n AS (SELECT DISTINCT a AS id FROM e),
         |pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM n),
         |${prIterSql("pr0", "pr1")},
         |${prIterSql("pr1", "pr2")},
         |${prIterSql("pr2", "pr3")}
         |SELECT CAST(id AS BIGINT) AS doc_id, pr FROM pr3""".stripMargin,
    // two unrolled majority-vote rounds over the shared edge CTE;
    // ties to the smallest label on both engines
    "label_propagation" ->
      s"""WITH $neardupEdgeSqlCte,
         |n AS (SELECT DISTINCT a AS id FROM e),
         |lp0 AS (
         |  SELECT n.id, CASE WHEN n.id < 250 THEN d.source END AS label
         |  FROM n JOIN documents d ON d.doc_id = n.id),
         |${lpIterSql("lp0", "lp1")},
         |${lpIterSql("lp1", "lp2")}
         |SELECT CAST(id AS BIGINT) AS doc_id, label FROM lp2""".stripMargin,
    "fuzzy_title_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, substr(text, 1, 30) AS head,
        |  array_to_string(string_split(text, ' ')[1:2], ' ') AS blk
        |  FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 5""".stripMargin,
    "topk_per_lang" ->
      """SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 3""".stripMargin,
    // tolerance-banded: DuckDB computes ITS approx sketches + exact
    // anchors and the same band booleans as the Spark side — the hash
    // compares bands + anchors, not engine-specific sketch values
    "approx_stats" ->
      """WITH base AS (SELECT lang, text, n_chars FROM documents),
        |sk AS (
        |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_texts,
        |         approx_count_distinct(text) AS andv,
        |         approx_quantile(n_chars, 0.5) AS p50a,
        |         approx_quantile(n_chars, 0.95) AS p95a
        |  FROM base GROUP BY lang),
        |ranks AS (
        |  SELECT b.lang,
        |         CAST(SUM(CASE WHEN b.n_chars <= s.p50a THEN 1 ELSE 0 END)
        |           AS BIGINT) AS le50,
        |         CAST(SUM(CASE WHEN b.n_chars <= s.p95a THEN 1 ELSE 0 END)
        |           AS BIGINT) AS le95
        |  FROM base b JOIN sk s USING (lang) GROUP BY b.lang)
        |SELECT s.lang, s.n_docs, s.distinct_texts,
        |  ABS(s.andv - s.distinct_texts) <=
        |    GREATEST(s.distinct_texts * 0.05, 2) AS ndv_ok,
        |  (r.le50 * 100 >= s.n_docs * 40 AND
        |   r.le50 * 100 <= s.n_docs * 60) AS p50_ok,
        |  (r.le95 * 100 >= s.n_docs * 88) AS p95_ok
        |FROM sk s JOIN ranks r USING (lang)""".stripMargin,
    "dedup_incremental" ->
      """WITH f AS (
        |  SELECT doc_id, lang,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(lower(text), ' '))), ' ')) AS fp
        |  FROM documents),
        |ex AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_new,
        |CAST(MIN(doc_id) AS BIGINT) AS first_new
        |FROM f
        |WHERE doc_id >= 250 AND fp NOT IN (SELECT fp FROM ex)
        |GROUP BY lang""".stripMargin,
    "dedup_incremental_bloom" ->
      // the bloom is a pre-filter whose misses are exact-joined, so
      // the result equals the plain anti-join — same oracle
      """WITH f AS (
        |  SELECT doc_id, lang,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(lower(text), ' '))), ' ')) AS fp
        |  FROM documents),
        |ex AS (SELECT DISTINCT fp FROM f WHERE doc_id < 250)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_new,
        |CAST(MIN(doc_id) AS BIGINT) AS first_new
        |FROM f
        |WHERE doc_id >= 250 AND fp NOT IN (SELECT fp FROM ex)
        |GROUP BY lang""".stripMargin,
    // the bloom-pruned read plus the exact residual equals the plain
    // point filter (no false negatives -> no lost rows; the residual
    // weeds false positives)
    "bloom_point_lookup" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id = 7""".stripMargin,
    // build-half + append-half == the whole corpus; the pruned read
    // over the appended index equals the plain point filter
    "bloom_lookup_incremental" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id = 300""".stripMargin,
    // compaction changes the physical layout, not the answer
    "bloom_lookup_compacted" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id = 300""".stripMargin,
    // tombstones mask exactly the deleted ids; live lookups unchanged
    "bloom_lookup_deleted" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id IN (8, 301)""".stripMargin,
    // the physical purge changes layout and sidecar, never the answer
    "bloom_lookup_purged" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents WHERE doc_id IN (8, 301)""".stripMargin,
    // bloom screen + exact confirm == plain membership: absent probes
    // (the +1000000 ids) drop either at the bloom or at the confirm
    // join, present probes survive both (no false negatives)
    "bloom_bulk_membership" ->
      """SELECT CAST(doc_id AS VARCHAR) AS k
        |FROM documents WHERE doc_id % 7 = 0
        |ORDER BY k""".stripMargin,
    // each check replayed as an independent aggregate; UNION ALL of
    // the four constraint rows
    "quality_checks" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(text) AS BIGINT) AS text_nonnull,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS id_distinct,
        |  CAST(COUNT(CASE WHEN n_chars BETWEEN 1 AND 10000 THEN 1 END)
        |    AS BIGINT) AS chars_in_bounds,
        |  CAST(COUNT(CASE WHEN lang IN ('de','en','es','fr','zh')
        |    THEN 1 END) AS BIGINT) AS lang_in_set
        |  FROM documents)
        |SELECT 'completeness_text' AS check, text_nonnull AS passed_rows,
        |  n AS total, text_nonnull = n AS passed FROM m
        |UNION ALL SELECT 'uniqueness_doc_id', id_distinct, n,
        |  id_distinct = n FROM m
        |UNION ALL SELECT 'bounds_n_chars_1_10000', chars_in_bounds, n,
        |  chars_in_bounds = n FROM m
        |UNION ALL SELECT 'domain_lang', lang_in_set, n,
        |  lang_in_set = n FROM m""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $clustersSqlCte,
         |q AS (SELECT doc_id, $qualitySql AS quality FROM documents)
         |SELECT cluster, keep_id, n_members, best_quality FROM (
         |  SELECT c.cluster, c.doc_id AS keep_id, q.quality AS best_quality,
         |  CAST(COUNT(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS n_members,
         |  row_number() OVER (PARTITION BY c.cluster
         |    ORDER BY q.quality DESC, c.doc_id) AS rn
         |  FROM clusters c JOIN q ON q.doc_id = c.doc_id) t
         |WHERE rn = 1""".stripMargin,
    "corpus_mix" ->
      """WITH k AS (
        |  SELECT source, lang, n_chars,
        |  CAST(substr(source, 4) AS INTEGER) % 4 AS m,
        |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS nib
        |  FROM documents)
        |SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |CAST(SUM(n_chars) AS BIGINT) AS kept_chars
        |FROM k
        |WHERE m = 3 OR nib < (CASE WHEN m = 0 THEN '4'
        |                      WHEN m = 1 THEN '8' ELSE 'c' END)
        |GROUP BY source, lang""".stripMargin,
    "simhash" ->
      s"""WITH $simhashSqlCte
         |SELECT doc_id, simhash FROM ssig""".stripMargin,
    // oracle is the O(n^2) brute force the banded plan provably equals
    "simhash_pairs" ->
      s"""WITH $simhash60SqlCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM ssig60 a JOIN ssig60 b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin,
    "ann_topk" ->
      """WITH p AS (
        |  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS pe
        |  FROM embeddings WHERE vec_id = 0),
        |c AS (
        |  SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
        |  FROM embeddings WHERE vec_id <> 0)
        |SELECT vec_id,
        |list_aggregate(list_transform(list_zip(ce, pe), z -> z[1]*z[2]), 'sum')
        |/ (sqrt(list_aggregate(list_transform(ce, x -> x*x), 'sum'))
        |  * sqrt(list_aggregate(list_transform(pe, x -> x*x), 'sum')))
        |AS cosine
        |FROM c, p
        |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "embed_neardup" ->
      """WITH v AS (
        |  SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
        |  sqrt(list_aggregate(list_transform(
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    x -> x*x), 'sum')) AS n
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |list_aggregate(list_transform(list_zip(a.ve, b.ve), z -> z[1]*z[2]),
        |  'sum') / (a.n * b.n) AS cosine
        |FROM v a JOIN v b ON a.vec_id < b.vec_id
        |WHERE list_aggregate(list_transform(list_zip(a.ve, b.ve),
        |  z -> z[1]*z[2]), 'sum') / (a.n * b.n) >= 0.45""".stripMargin,
    // ann_ivf oracle: same two-stage plan relationally. Assignment ties
    // break to the lowest cid on both sides (Spark: max over (score,-cid)
    // struct; here: row_number ORDER BY score DESC, cid). Scores are
    // sequential double folds -> bit-identical across engines.
    "ann_ivf" -> annIvfOracle,
    // the bucketed materialization changes the physical plan, not the
    // answer: parquet round-trips doubles exactly, so one oracle serves
    "ann_ivf_bucketed" -> annIvfOracle,
    "media_features" ->
      // replay the DECODED image features analytically: the PPM fixture
      // is "P6\n<w> <h>\n255\n" (11 bytes at single-digit dims) + 3wh
      // raster bytes whose channels follow (7id+3p)%256 / (11id+5p)%256
      // / (13id+7p)%256 — the engine parses the actual bytes, the
      // oracle computes what the parse must yield
      // audio replay: the WAV fixture is a 44-byte canonical RIFF
      // header + 2*ns PCM16 bytes with s(k) = (31 id + 17 k)%4096-2048
      // video replay: GFV1 is 12 header bytes + nf concatenated P6
      // frames; channel laws add 19f/23f/29f per frame f, and the
      // engine samples every 2nd frame (f % 2 = 0) before averaging
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
        |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    CAST(4 + doc_id % 5 AS INTEGER) AS w,
        |    CAST(3 + doc_id % 4 AS INTEGER) AS h,
        |    CAST(64 + doc_id % 129 AS INTEGER) AS ns,
        |    CAST(2 + doc_id % 4 AS INTEGER) AS nf
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, COUNT(*) AS npx,
        |    SUM((doc_id * 7 + p * 3) % 256) AS sr,
        |    SUM((doc_id * 11 + p * 5) % 256) AS sg,
        |    SUM((doc_id * 13 + p * 7) % 256) AS sb
        |  FROM base, generate_series(0, 47) g(p)
        |  WHERE kind = 'image' AND p < w * h
        |  GROUP BY doc_id),
        |au AS (
        |  SELECT doc_id,
        |    MAX(abs((doc_id * 31 + k * 17) % 4096 - 2048)) AS pk,
        |    SUM(((doc_id * 31 + k * 17) % 4096 - 2048) *
        |        ((doc_id * 31 + k * 17) % 4096 - 2048)) AS ss
        |  FROM base, generate_series(0, 191) g(k)
        |  WHERE kind = 'audio' AND k < ns
        |  GROUP BY doc_id),
        |vx AS (
        |  SELECT doc_id, COUNT(*) AS npx,
        |    SUM((doc_id * 7 + p * 3 + f * 19) % 256) AS sr,
        |    SUM((doc_id * 11 + p * 5 + f * 23) % 256) AS sg,
        |    SUM((doc_id * 13 + p * 7 + f * 29) % 256) AS sb
        |  FROM base, generate_series(0, 5) gf(f), generate_series(0, 47) g(p)
        |  WHERE kind = 'video' AND f < nf AND f % 2 = 0 AND p < w * h
        |  GROUP BY doc_id)
        |SELECT b.doc_id AS media_id, b.kind,
        |  CAST(CASE WHEN b.kind = 'image' THEN 11 + 3 * b.w * b.h
        |    WHEN b.kind = 'audio' THEN 44 + 2 * b.ns
        |    ELSE 12 + b.nf * (11 + 3 * b.w * b.h) END AS BIGINT) AS n_bytes,
        |  CASE WHEN b.kind <> 'audio' THEN b.w END AS width,
        |  CASE WHEN b.kind <> 'audio' THEN b.h END AS height,
        |  CAST(COALESCE(px.sr, vx.sr) AS DOUBLE)
        |    / COALESCE(px.npx, vx.npx) AS mean_r,
        |  CAST(COALESCE(px.sg, vx.sg) AS DOUBLE)
        |    / COALESCE(px.npx, vx.npx) AS mean_g,
        |  CAST(COALESCE(px.sb, vx.sb) AS DOUBLE)
        |    / COALESCE(px.npx, vx.npx) AS mean_b,
        |  CAST(CASE WHEN b.kind = 'audio' THEN 8000 END AS INTEGER)
        |    AS sample_rate,
        |  CAST(CASE WHEN b.kind = 'audio' THEN b.ns END AS BIGINT)
        |    AS n_samples,
        |  CAST(au.pk AS BIGINT) AS peak_abs,
        |  sqrt(CAST(au.ss AS DOUBLE) / b.ns) AS rms,
        |  CAST(CASE WHEN b.kind = 'video' THEN b.nf END AS BIGINT)
        |    AS n_frames,
        |  CAST(CASE WHEN b.kind = 'video' THEN 40 * b.nf
        |    WHEN b.kind = 'audio' THEN (b.ns * 1000) // 8000 END
        |    AS BIGINT) AS duration_ms
        |FROM base b LEFT JOIN px ON b.doc_id = px.doc_id
        |LEFT JOIN au ON b.doc_id = au.doc_id
        |LEFT JOIN vx ON b.doc_id = vx.doc_id""".stripMargin,

    "media_resize" ->
      // replay the RESIZED raster analytically: nearest pixel-center
      // mapping picks source pixel (sy, sx) with sy=((2dy+1)h0)//10,
      // sx=((2dx+1)w0)//12 for the 6x5 target; the engine runs the real
      // decode -> resample -> P6 re-encode -> decode chain, the oracle
      // computes what those bytes must average to. n_bytes = len("P6\n6
      // 5\n255\n") + 3*30 = 101.
      """WITH base AS (
        |  SELECT doc_id, CAST(4 + doc_id % 5 AS INTEGER) AS w0,
        |         CAST(3 + doc_id % 4 AS INTEGER) AS h0
        |  FROM documents WHERE doc_id % 3 = 0),
        |sp AS (
        |  SELECT doc_id,
        |    (((2 * dy + 1) * h0) // 10) * w0 + ((2 * dx + 1) * w0) // 12 AS p
        |  FROM base, generate_series(0, 4) gy(dy),
        |       generate_series(0, 5) gx(dx)),
        |m AS (
        |  SELECT doc_id, COUNT(*) AS npx,
        |    SUM((doc_id * 7 + p * 3) % 256) AS sr,
        |    SUM((doc_id * 11 + p * 5) % 256) AS sg,
        |    SUM((doc_id * 13 + p * 7) % 256) AS sb
        |  FROM sp GROUP BY doc_id)
        |SELECT b.doc_id AS media_id, 'image' AS kind,
        |  CAST(101 AS BIGINT) AS n_bytes,
        |  CAST(6 AS INTEGER) AS width, CAST(5 AS INTEGER) AS height,
        |  CAST(m.sr AS DOUBLE) / m.npx AS mean_r,
        |  CAST(m.sg AS DOUBLE) / m.npx AS mean_g,
        |  CAST(m.sb AS DOUBLE) / m.npx AS mean_b,
        |  CAST(NULL AS INTEGER) AS sample_rate,
        |  CAST(NULL AS BIGINT) AS n_samples,
        |  CAST(NULL AS BIGINT) AS peak_abs,
        |  CAST(NULL AS DOUBLE) AS rms,
        |  CAST(NULL AS BIGINT) AS n_frames,
        |  CAST(NULL AS BIGINT) AS duration_ms
        |FROM base b JOIN m ON b.doc_id = m.doc_id""".stripMargin,

    "media_video_frames" ->
      // per-sampled-frame replay of the GFV1 fixture laws: the engine
      // decodes the real bytes frame by frame; the oracle computes what
      // each sampled frame's decoded means must be
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 5 AS INTEGER) AS w,
        |    CAST(3 + doc_id % 4 AS INTEGER) AS h,
        |    CAST(2 + doc_id % 4 AS INTEGER) AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fx AS (
        |  SELECT doc_id, f, w, h,
        |    SUM((doc_id * 7 + p * 3 + f * 19) % 256) AS sr,
        |    SUM((doc_id * 11 + p * 5 + f * 23) % 256) AS sg,
        |    SUM((doc_id * 13 + p * 7 + f * 29) % 256) AS sb
        |  FROM base, generate_series(0, 5) gf(f), generate_series(0, 47) g(p)
        |  WHERE f < nf AND f % 2 = 0 AND p < w * h
        |  GROUP BY doc_id, f, w, h)
        |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
        |  CAST(f * 40 AS BIGINT) AS frame_ms, w AS width, h AS height,
        |  CAST(sr AS DOUBLE) / (w * h) AS mean_r,
        |  CAST(sg AS DOUBLE) / (w * h) AS mean_g,
        |  CAST(sb AS DOUBLE) / (w * h) AS mean_b
        |FROM fx""".stripMargin,
    // analytic raster replay: channels follow (7id+3p)%256 /
    // (11id+5p)%256 / (13id+7p)%256 at p = y*w+x (the ppmFixture
    // law); each gradient bit contributes its exact power of two
    "image_dhash" ->
      """WITH im AS (
        |  SELECT doc_id AS media_id,
        |  4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |ys AS (SELECT media_id, w, h,
        |       unnest(generate_series(0, h - 1)) AS y FROM im),
        |xs AS (SELECT media_id, w, h, y,
        |       unnest(generate_series(0, w - 2)) AS x FROM ys),
        |gb AS (SELECT media_id, w, h,
        |  y * (w - 1) + x AS b,
        |  (media_id*7 + (y*w+x)*3) % 256 + (media_id*11 + (y*w+x)*5) % 256
        |    + (media_id*13 + (y*w+x)*7) % 256 AS g0,
        |  (media_id*7 + (y*w+x+1)*3) % 256
        |    + (media_id*11 + (y*w+x+1)*5) % 256
        |    + (media_id*13 + (y*w+x+1)*7) % 256 AS g1
        |  FROM xs)
        |SELECT media_id, CAST(MIN(w) AS INTEGER) AS width,
        |CAST(MIN(h) AS INTEGER) AS height,
        |CAST(SUM(CASE WHEN g0 > g1
        |  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
        |  ELSE 0 END) AS BIGINT) AS dhash
        |FROM gb GROUP BY media_id""".stripMargin,
    // analytic replay of decode AND the 9x8 nearest resample: sampled
    // source pixel (sx, sy) = (((2dx+1)w)//18, ((2dy+1)h)//16), gray
    // from the ppmFixtureLarge channel laws at p = sy*w + sx; bit
    // b = dy*8 + dx splits into unsigned 32-bit halves (2^63 would
    // overflow a BIGINT sum)
    "image_dhash_scaled" ->
      """WITH im AS (
        |  SELECT doc_id AS media_id,
        |  16 + doc_id % 7 AS w, 12 + doc_id % 5 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |ys AS (SELECT media_id, w, h,
        |       unnest(generate_series(0, 7)) AS dy FROM im),
        |xs AS (SELECT media_id, w, h, dy,
        |       unnest(generate_series(0, 7)) AS dx FROM ys),
        |gb AS (SELECT media_id, w, h,
        |  dy * 8 + dx AS b,
        |  (((2*dy+1) * h) // 16) * w + (((2*dx+1) * w) // 18) AS p0,
        |  (((2*dy+1) * h) // 16) * w + (((2*(dx+1)+1) * w) // 18) AS p1
        |  FROM xs),
        |gr AS (SELECT media_id, w, h, b,
        |  (media_id*7 + p0*3) % 256 + (media_id*11 + p0*5) % 256
        |    + (media_id*13 + p0*7) % 256 AS g0,
        |  (media_id*7 + p1*3) % 256 + (media_id*11 + p1*5) % 256
        |    + (media_id*13 + p1*7) % 256 AS g1
        |  FROM gb)
        |SELECT media_id, CAST(MIN(w) AS INTEGER) AS width,
        |CAST(MIN(h) AS INTEGER) AS height,
        |CAST(SUM(CASE WHEN b >= 32 AND g0 > g1
        |  THEN CAST(1 AS BIGINT) << CAST(b - 32 AS INTEGER)
        |  ELSE 0 END) AS BIGINT) AS dhash_hi,
        |CAST(SUM(CASE WHEN b < 32 AND g0 > g1
        |  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
        |  ELSE 0 END) AS BIGINT) AS dhash_lo
        |FROM gr GROUP BY media_id""".stripMargin,
    // the O(n^2) brute force over analytically-replayed hashes: both
    // fixture variants' 64-bit dHashes rebuilt as unsigned 32-bit
    // halves from the channel laws (+v in the red law is the
    // re-encode), then EVERY pair hamming-tested — the exact form the
    // banded join provably equals (pigeonhole), existing only as the
    // oracle
    "image_dhash_pairs" ->
      s"""WITH $dhashMediaSqlCte
         |SELECT media_a, media_b, hamming FROM prs""".stripMargin,
    // pairs -> symmetric edges -> recursive min-reachability (the
    // dedup_clusters CTE shape) -> keep-best by resolution DESC then
    // lowest media_id; singletons (no edge) keep themselves
    "image_dedup_pipeline" ->
      s"""WITH RECURSIVE $dhashMediaSqlCte,
         |e AS (SELECT media_a AS a, media_b AS b FROM prs
         |      UNION ALL SELECT media_b, media_a FROM prs),
         |reach(id, r) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.id),
         |cl AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
         |lab AS (
         |  SELECT im.media_id,
         |  CAST(COALESCE(cl.cluster, im.media_id) AS BIGINT) AS cluster,
         |  im.w, im.h
         |  FROM (SELECT DISTINCT media_id, w, h FROM im) im
         |  LEFT JOIN cl ON cl.id = im.media_id)
         |SELECT media_id, cluster,
         |(row_number() OVER (PARTITION BY cluster
         |  ORDER BY w * h DESC, media_id) = 1) AS keep
         |FROM lab""".stripMargin,
    // analytic PCM replay (s(k) = (31 id + 17 k) % 4096 - 2048, the
    // wavFixture law) + windowed gaps-and-islands — a different
    // algorithm for the same exact sign-run integers the engine's
    // array fold emits from the parsed bytes
    "audio_zcr_segments" ->
      """WITH au AS (
        |  SELECT doc_id AS media_id, 64 + doc_id % 129 AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |ks AS (SELECT media_id,
        |       unnest(generate_series(0, n - 1)) AS k FROM au),
        |sg AS (SELECT media_id, k,
        |       CASE WHEN (media_id * 31 + k * 17) % 4096 < 2048
        |       THEN 1 ELSE 0 END AS neg FROM ks),
        |gi AS (SELECT media_id, k, neg,
        |       k - row_number() OVER (PARTITION BY media_id, neg
        |         ORDER BY k) AS grp FROM sg),
        |runs AS (SELECT media_id, neg, grp, COUNT(*) AS len
        |         FROM gi GROUP BY media_id, neg, grp)
        |SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
        |CAST(MAX(len) AS BIGINT) AS longest_run
        |FROM runs GROUP BY media_id""".stripMargin,
    "text_stats" ->
      """SELECT doc_id,
        |CAST(length(text) AS BIGINT) AS n_chars_calc,
        |CAST(strlen(text) AS BIGINT) AS n_bytes,
        |CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |  AS n_tokens,
        |CAST((length(' ' || text || ' ') -
        |  length(replace(' ' || text || ' ', ' the ', ' '))) / 4 AS BIGINT)
        |  AS n_the
        |FROM documents""".stripMargin,
    "lang_guess" -> {
      def hits(w: String) =
        s"(length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' $w ', ' '))) / ${w.length + 1}"
      val en = s"(${hits("the")} + ${hits("and")} + ${hits("of")})"
      val de = s"(${hits("der")} + ${hits("und")} + ${hits("die")})"
      val fr = s"(${hits("le")} + ${hits("et")} + ${hits("la")})"
      val es = s"(${hits("el")} + ${hits("y")} + ${hits("los")})"
      s"""SELECT doc_id, lang,
         |CASE WHEN strlen(text) <> length(text) THEN 'zh'
         |WHEN $de > $en AND $de > $fr AND $de > $es THEN 'de'
         |WHEN $fr > $en AND $fr > $de AND $fr > $es THEN 'fr'
         |WHEN $es > $en AND $es > $de AND $es > $fr THEN 'es'
         |WHEN $en > 0 THEN 'en'
         |ELSE 'unknown' END AS guess
         |FROM documents""".stripMargin
    },
    // same synthetic weight law ((feat*p + q) % 1001 - 500, integer),
    // same first-md5-byte feature hash; ties break to the
    // lexicographically LAST class (ORDER BY score DESC, cls DESC ==
    // Spark's max(struct(score, cls)))
    "domain_classify" ->
      """WITH w AS (
        |  SELECT cls, g.k AS feat,
        |  (g.k * p + q) % 1001 - 500 AS w
        |  FROM (VALUES ('web', 7, 13), ('news', 11, 97),
        |        ('code', 17, 31), ('wiki', 23, 5)) c(cls, p, q)
        |  CROSS JOIN generate_series(0, 255) g(k)),
        |tok AS (
        |  SELECT doc_id,
        |  (strpos('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 16 +
        |  (strpos('0123456789abcdef', substr(md5(token), 2, 1)) - 1) AS feat
        |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |        FROM documents) t),
        |pf AS (SELECT doc_id, feat, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |sc AS (SELECT doc_id, cls, SUM(tf * w) AS score
        |       FROM pf JOIN w USING (feat) GROUP BY 1, 2),
        |r AS (SELECT doc_id, cls, score, row_number() OVER (
        |        PARTITION BY doc_id ORDER BY score DESC, cls DESC) AS rn
        |      FROM sc)
        |SELECT doc_id, cls AS domain, CAST(score AS BIGINT) AS score
        |FROM r WHERE rn = 1""".stripMargin,
    "token_count_bpe" ->
      """SELECT doc_id,
        |CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |  AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "quality_score" ->
      s"SELECT doc_id, $qualitySql AS quality FROM documents",
    // DuckDB lists are 1-based (Spark subscripts 0-based); range() end
    // is exclusive, so i runs 1..len-2 and i+2 stays in bounds
    "quality_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, len(toks) - 2 AS n_grams,
        |    len(list_distinct(list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
        |      AS n_uniq
        |  FROM t WHERE len(toks) >= 3)
        |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
        |  CAST(n_uniq AS BIGINT) AS n_uniq,
        |  CAST(n_grams - n_uniq AS DOUBLE) / CAST(n_grams AS DOUBLE)
        |    AS dup_frac
        |FROM g""".stripMargin,
    "quantile_chars" ->
      """SELECT lang, quantile_cont(n_chars, 0.5) AS p50_chars,
        |quantile_cont(n_chars, 0.9) AS p90_chars
        |FROM documents GROUP BY lang""".stripMargin,
    // parallel unnests zip in DuckDB; range(n) matches posexplode's
    // 0-based positions
    "token_encode" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(range(len(string_split(text, ' ')))) AS pos,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |ranked AS (
        |  SELECT tok, CAST(row_number() OVER (ORDER BY COUNT(*) DESC, tok)
        |    AS BIGINT) AS token_id
        |  FROM toks GROUP BY tok)
        |SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos, r.token_id
        |FROM toks t JOIN ranked r ON t.tok = r.tok""".stripMargin,
    "seq_pack" ->
      """WITH n AS (
        |  SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
        |    AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |  SUM(n) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS before
        |  FROM n)
        |SELECT doc_id, CAST(floor(before / 4096) AS BIGINT) AS seq_id,
        |CAST(before % 4096 AS BIGINT) AS offset
        |FROM c""".stripMargin,
    // chunk starts replayed with range(); DuckDB list_slice's inclusive
    // 1-based [begin, end] == Spark slice(arr, start, 16) after
    // end-of-list truncation on both sides
    "doc_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |  unnest(range(0, greatest(CAST(ceil((len(toks) - 16) / 12.0)
        |    AS BIGINT), 0) + 1)) AS k
        |  FROM t)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        |CAST(len(list_slice(toks, k*12 + 1, k*12 + 16)) AS BIGINT)
        |  AS n_tokens,
        |array_to_string(list_slice(toks, k*12 + 1, k*12 + 16), ' ')
        |  AS chunk
        |FROM c""".stripMargin,
    "sample_hash" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |  IN ('0','1','2','3')
        |GROUP BY lang""".stripMargin,
    "stratified_sample" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
        |CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE CASE WHEN lang = 'en'
        |  THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |    IN ('0','1','2','3')
        |  ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |    IN ('0','1','2','3','4','5','6','7') END
        |GROUP BY lang""".stripMargin,
    "pii_redact" ->
      """WITH t AS (
        |  SELECT doc_id,
        |  lower(text) || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example tel ' || CAST(n_chars AS VARCHAR) AS s
        |  FROM documents)
        |SELECT doc_id,
        |CAST(len(regexp_extract_all(s,
        |  '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |CAST(len(regexp_extract_all(s, '[0-9]+')) AS BIGINT) AS n_numbers,
        |md5(regexp_replace(regexp_replace(s,
        |  '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |  '[0-9]+', '<NUM>', 'g')) AS redacted_md5
        |FROM t""".stripMargin,
    "corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS h1 FROM documents),
        |v2 AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id % 7 = 0
        |    THEN text || ' v2' ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 11 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000000, md5(text) FROM documents
        |  WHERE doc_id % 13 = 5)
        |SELECT doc_id,
        |CASE WHEN h1 IS NULL THEN 'added'
        |     WHEN h2 IS NULL THEN 'removed'
        |     WHEN h1 <> h2 THEN 'changed' END AS change
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |WHERE h1 IS NULL OR h2 IS NULL OR h1 <> h2""".stripMargin,
    "shard_manifest" ->
      """SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
        |CAST(COUNT(*) AS BIGINT) AS n_docs,
        |CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        |CAST(MAX(doc_id) AS BIGINT) AS max_doc
        |FROM documents GROUP BY 1""".stripMargin,
    "global_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, md5('seed42:' || CAST(doc_id AS VARCHAR)) AS key
        |  FROM documents)
        |SELECT doc_id, substr(key, 1, 1) AS shard,
        |CAST(row_number() OVER (PARTITION BY substr(key, 1, 1)
        |  ORDER BY key, doc_id) AS BIGINT) AS pos
        |FROM k""".stripMargin,
    "decontam_ngram" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(w)-4, 1)),
        |    i -> array_to_string(w[i:i+4], ' ')))) AS g
        |  FROM tok),
        |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 100 = 0)
        |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
        |FROM g JOIN ev USING (g)
        |WHERE g.doc_id % 100 <> 0
        |GROUP BY g.doc_id""".stripMargin,
    // same sequential-fold cosine replay as embed_neardup's oracle
    "decontam_embed" ->
      """WITH v AS (
        |  SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
        |  sqrt(list_aggregate(list_transform(
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    x -> x*x), 'sum')) AS n
        |  FROM embeddings)
        |SELECT a.vec_id, CAST(COUNT(*) AS BIGINT) AS n_eval_hits
        |FROM v a JOIN v b ON b.vec_id % 97 = 0 AND a.vec_id % 97 <> 0
        |WHERE list_aggregate(list_transform(list_zip(a.ve, b.ve),
        |  z -> z[1]*z[2]), 'sum') / (a.n * b.n) >= 0.35
        |GROUP BY a.vec_id""".stripMargin,
    "tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf
        |       FROM toks GROUP BY doc_id, term),
        |df AS (SELECT term, COUNT(*) AS df
        |       FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, term, score, rank FROM (
        |  SELECT tf.doc_id, tf.term,
        |  (tf.tf * n.n_docs) / df.df AS score,
        |  CAST(row_number() OVER (PARTITION BY tf.doc_id
        |    ORDER BY (tf.tf * n.n_docs) / df.df DESC, tf.term)
        |    AS BIGINT) AS rank
        |  FROM tf, df, n WHERE tf.term = df.term) t
        |WHERE rank <= 3""".stripMargin,
    // one Lloyd iteration + final labelling, unrolled relationally:
    // the same (|v|^2 - 2<v,c>) + |c|^2 sequential folds, the same
    // fixed-point mean (floor(x*2^20+0.5) sums are exact integer-
    // valued doubles -> order-independent), ties to the lowest cid
    "kmeans_embed" ->
      s"""WITH $kmeansCte
         |SELECT id AS vec_id, CAST(cluster AS BIGINT) AS cluster, dist2
         |FROM (
         |  SELECT id, cid AS cluster, dist2,
         |  row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
         |  FROM d2) t
         |WHERE rn = 1""".stripMargin,
    // same final labelling, contingency against the gold label column
    "cluster_purity" ->
      s"""WITH $kmeansCte,
         |a2 AS (
         |  SELECT id, cid AS cluster FROM (
         |    SELECT id, cid,
         |    row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
         |    FROM d2) t WHERE rn = 1)
         |SELECT CAST(a2.cluster AS BIGINT) AS cluster,
         |CAST(e.label AS BIGINT) AS label,
         |CAST(COUNT(*) AS BIGINT) AS n
         |FROM a2 JOIN embeddings e ON a2.id = e.vec_id
         |GROUP BY 1, 2""".stripMargin,
    // final labelling a2 as in ann_ivf_kmeans; within-cluster pairs
    // only; a vector is dropped iff a smaller-id same-cluster vector
    // sits within 0.45 cosine (dot/(|x||y|), the same sequential folds)
    "semdedup" ->
      s"""WITH $kmeansCte,
         |a2 AS (
         |  SELECT id, v, cid AS cluster FROM (
         |    SELECT id, v, cid,
         |    row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
         |    FROM d2) t WHERE rn = 1),
         |dropped AS (
         |  SELECT DISTINCT y.id AS id
         |  FROM a2 x JOIN a2 y
         |  ON x.cluster = y.cluster AND x.id < y.id
         |  WHERE list_aggregate(list_transform(list_zip(x.v, y.v),
         |      z -> z[1]*z[2]), 'sum') /
         |    (sqrt(list_aggregate(list_transform(x.v, u -> u*u), 'sum')) *
         |     sqrt(list_aggregate(list_transform(y.v, u -> u*u), 'sum')))
         |    >= 0.45)
         |SELECT a2.id AS vec_id, CAST(a2.cluster AS BIGINT) AS cluster
         |FROM a2 WHERE a2.id NOT IN (SELECT id FROM dropped)""".stripMargin,
    // per-dim trained SQ8: codes hashed through the same comma-joined
    // decimal rendering; err is the listwise sequential fold
    "embed_sq8" ->
      s"""WITH $sq8Cte
         |SELECT id AS vec_id,
         |md5(array_to_string(list_transform(codes, u -> CAST(u AS VARCHAR)),
         |    ',')) AS qhash,
         |list_aggregate(list_transform(list_zip(v, codes, lo, s), z ->
         |  (z[1] - (z[3] + CAST(z[2] AS DOUBLE) * z[4])) *
         |  (z[1] - (z[3] + CAST(z[2] AS DOUBLE) * z[4]))), 'sum') AS err
         |FROM sq8c, sq8l""".stripMargin,
    // SQ8 ADC: per-dim reconstruction against the exact probe; the
    // 4-way zip folds listwise in index order (the ann_topk law)
    "ann_sq8" ->
      s"""WITH $sq8Cte,
         |sq8p AS (SELECT v AS pe FROM sq8e WHERE id = 8)
         |SELECT c.id AS vec_id,
         |list_aggregate(list_transform(list_zip(c.codes, pe, lo, s), z ->
         |  (z[2] - (z[3] + CAST(z[1] AS DOUBLE) * z[4])) *
         |  (z[2] - (z[3] + CAST(z[1] AS DOUBLE) * z[4]))), 'sum') AS adist
         |FROM sq8c c, sq8p, sq8l
         |WHERE c.id <> 8
         |ORDER BY adist, vec_id LIMIT 10""".stripMargin,
    // int8 max-abs quantization; q hashed through the same
    // comma-joined decimal rendering on both engines
    "embed_pq" ->
      s"""WITH $pqCte
         |SELECT id AS vec_id,
         |CAST(MIN(CASE WHEN sub = 0 THEN code END) AS BIGINT) AS code0,
         |CAST(MIN(CASE WHEN sub = 1 THEN code END) AS BIGINT) AS code1
         |FROM codespq GROUP BY id""".stripMargin,
    // the ADC sum of two doubles is a single commutative addition —
    // Spark's two-row sum() and this one `+` agree bit-for-bit
    "ann_pq_adc" ->
      s"""WITH $pqCte,
         |lutpq AS (
         |  SELECT c.sub, c.cid,
         |  (list_aggregate(list_transform(p.sv, x -> x*x), 'sum')
         |   - 2 * list_aggregate(list_transform(list_zip(p.sv, c.cv),
         |       z -> z[1]*z[2]), 'sum'))
         |   + list_aggregate(list_transform(c.cv, x -> x*x), 'sum') AS dd
         |  FROM c1pq c JOIN espq p ON p.id = 8 AND p.sub = c.sub),
         |widepq AS (
         |  SELECT id,
         |  MIN(CASE WHEN sub = 0 THEN code END) AS code0,
         |  MIN(CASE WHEN sub = 1 THEN code END) AS code1
         |  FROM codespq GROUP BY id)
         |SELECT CAST(w.id AS BIGINT) AS vec_id, l0.dd + l1.dd AS adist
         |FROM widepq w
         |JOIN lutpq l0 ON l0.sub = 0 AND l0.cid = w.code0
         |JOIN lutpq l1 ON l1.sub = 1 AND l1.cid = w.code1
         |WHERE w.id <> 8
         |ORDER BY adist, vec_id LIMIT 10""".stripMargin,
    "ann_pq_rerank" ->
      s"""WITH $pqCte,
         |lutpq AS (
         |  SELECT c.sub, c.cid,
         |  (list_aggregate(list_transform(p.sv, x -> x*x), 'sum')
         |   - 2 * list_aggregate(list_transform(list_zip(p.sv, c.cv),
         |       z -> z[1]*z[2]), 'sum'))
         |   + list_aggregate(list_transform(c.cv, x -> x*x), 'sum') AS dd
         |  FROM c1pq c JOIN espq p ON p.id = 8 AND p.sub = c.sub),
         |widepq AS (
         |  SELECT id,
         |  MIN(CASE WHEN sub = 0 THEN code END) AS code0,
         |  MIN(CASE WHEN sub = 1 THEN code END) AS code1
         |  FROM codespq GROUP BY id),
         |adcq AS (
         |  SELECT w.id, l0.dd + l1.dd AS adist
         |  FROM widepq w
         |  JOIN lutpq l0 ON l0.sub = 0 AND l0.cid = w.code0
         |  JOIN lutpq l1 ON l1.sub = 1 AND l1.cid = w.code1
         |  WHERE w.id <> 8),
         |slq AS (SELECT id FROM adcq ORDER BY adist, id LIMIT 50),
         |pvq AS (SELECT v AS pv FROM epq WHERE id = 8)
         |SELECT CAST(e.id AS BIGINT) AS vec_id,
         |(list_aggregate(list_transform(e.v, x -> x*x), 'sum')
         | - 2 * list_aggregate(list_transform(list_zip(e.v, pv),
         |     z -> z[1]*z[2]), 'sum'))
         | + list_aggregate(list_transform(pv, x -> x*x), 'sum') AS d2
         |FROM epq e JOIN slq ON e.id = slq.id, pvq
         |ORDER BY d2, vec_id LIMIT 10""".stripMargin,
    // coarse cell from the kmeans CTE, ADC from the PQ CTE — the two
    // staged pipelines compose with disjoint CTE names
    "ann_ivfpq" ->
      s"""WITH $kmeansCte,
         |$pqCte,
         |a2q AS (
         |  SELECT id, cid AS cluster FROM (
         |    SELECT id, cid,
         |    row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
         |    FROM d2) t WHERE rn = 1),
         |pcellq AS (SELECT cluster FROM a2q WHERE id = 8),
         |cellq AS (SELECT a2q.id FROM a2q, pcellq
         |          WHERE a2q.cluster = pcellq.cluster),
         |lutpq AS (
         |  SELECT c.sub, c.cid,
         |  (list_aggregate(list_transform(p.sv, x -> x*x), 'sum')
         |   - 2 * list_aggregate(list_transform(list_zip(p.sv, c.cv),
         |       z -> z[1]*z[2]), 'sum'))
         |   + list_aggregate(list_transform(c.cv, x -> x*x), 'sum') AS dd
         |  FROM c1pq c JOIN espq p ON p.id = 8 AND p.sub = c.sub),
         |widepq AS (
         |  SELECT cq.id,
         |  MIN(CASE WHEN sub = 0 THEN code END) AS code0,
         |  MIN(CASE WHEN sub = 1 THEN code END) AS code1
         |  FROM codespq JOIN cellq cq ON codespq.id = cq.id
         |  GROUP BY cq.id)
         |SELECT CAST(w.id AS BIGINT) AS vec_id, l0.dd + l1.dd AS adist
         |FROM widepq w
         |JOIN lutpq l0 ON l0.sub = 0 AND l0.cid = w.code0
         |JOIN lutpq l1 ON l1.sub = 1 AND l1.cid = w.code1
         |WHERE w.id <> 8
         |ORDER BY adist, vec_id LIMIT 10""".stripMargin,
    "embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |       list_max(list_transform(v, u -> abs(u))) AS scale FROM e),
        |qq AS (SELECT vec_id, v, scale,
        |       list_transform(v,
        |         u -> CAST(floor(u * 127.0 / scale + 0.5) AS INT)) AS q
        |       FROM sc)
        |SELECT vec_id, scale,
        |md5(array_to_string(list_transform(q, u -> CAST(u AS VARCHAR)),
        |    ',')) AS qhash,
        |list_aggregate(list_transform(list_zip(v, q),
        |  z -> (z[1] - CAST(z[2] AS DOUBLE) * scale / 127.0) *
        |       (z[1] - CAST(z[2] AS DOUBLE) * scale / 127.0)), 'sum') AS err
        |FROM qq""".stripMargin,
    // trained-codebook IVF: the kmeans CTEs produce c1, the final
    // assignment keeps v, the probe scores its own cell by cosine
    "ann_ivf_kmeans" ->
      s"""WITH $kmeansCte,
         |a2 AS (
         |  SELECT id, v, cid AS cluster FROM (
         |    SELECT id, v, cid,
         |    row_number() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
         |    FROM d2) t WHERE rn = 1),
         |p AS (
         |  SELECT cluster AS pb, v AS pv,
         |  sqrt(list_aggregate(list_transform(v, x -> x*x), 'sum')) AS pn
         |  FROM a2 WHERE id = 8)
         |SELECT a.id AS vec_id,
         |list_aggregate(list_transform(list_zip(a.v, p.pv), z -> z[1]*z[2]),
         |  'sum') / (sqrt(list_aggregate(list_transform(a.v, x -> x*x),
         |  'sum')) * p.pn) AS cosine
         |FROM a2 a, p
         |WHERE a.cluster = p.pb AND a.id <> 8
         |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin,
    "pipeline_clean" -> {
      val quality = qualitySql
      s"""WITH dedup AS (
         |  SELECT * FROM (
         |    SELECT doc_id, text, lang,
         |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM documents) t WHERE rn = 1),
         |clean AS (SELECT * FROM dedup WHERE $quality >= 0.5)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |CAST(SUM(len(regexp_extract_all(lower(text),
         |  '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_tokens
         |FROM clean GROUP BY lang""".stripMargin
    },
    "join_asof_tol" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |CASE WHEN epoch_us(ts) - lc <= 3600000000 THEN lc END
        |  AS last_click_us,
        |CASE WHEN epoch_us(ts) - lc <= 3600000000
        |  THEN epoch_us(ts) - lc END AS gap_us
        |FROM (
        |  SELECT *,
        |  last_value(CASE WHEN event_type = 'click'
        |      THEN epoch_us(ts) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS lc
        |  FROM events) t
        |WHERE event_type = 'view'""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, last_click_us,
        |epoch_us(ts) - last_click_us AS gap_us
        |FROM (
        |  SELECT *,
        |  last_value(CASE WHEN event_type = 'click'
        |      THEN epoch_us(ts) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_click_us
        |  FROM events) t
        |WHERE event_type = 'view'""".stripMargin,
    // doc_winnow oracle replays the winnowing fingerprint relationally:
    // per-gram modular hash fold (code points, h=(h*257+cp)%1000003), then
    // rightmost-min-per-window via a packed (hash, -position) min over a
    // 4-row frame. Window starts limited to 1..n-w+1 (or just 1 when the
    // doc has fewer grams than the window), matching RollingFingerprint.
    "doc_winnow" -> {
      val gramHash = (0 until 5).foldLeft("0") { (acc, j) =>
        s"(($acc) * 257 + ascii(substr(text, i+$j, 1))) % 1000003"
      }
      s"""WITH g AS (
         |  SELECT doc_id, text, length(text) - 4 AS n,
         |    unnest(generate_series(1, greatest(length(text) - 4, 0))) AS i
         |  FROM documents),
         |h AS (
         |  SELECT doc_id, i, n, $gramHash AS hv FROM g),
         |wnd AS (
         |  SELECT doc_id, i, n,
         |    min(CAST(hv AS BIGINT) * 16777216 + (16777216 - i)) OVER (
         |      PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS combo
         |  FROM h)
         |SELECT DISTINCT doc_id, CAST(combo // 16777216 AS BIGINT) AS fp
         |FROM wnd WHERE i <= greatest(n - 3, 1)""".stripMargin
    },
    "token_hist" ->
      """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
        |      FROM documents) t
        |GROUP BY token""".stripMargin,
    "events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |CAST(COUNT(*) AS BIGINT) AS cnt,
        |CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |  AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "median_by_lang" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang,
        |(MIN(n_chars) + MAX(n_chars)) / 2.0 AS median_chars,
        |CAST(MAX(n) AS BIGINT) AS n_docs
        |FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |GROUP BY lang""".stripMargin,
    // independent row-rank formulation of the same type-1 quantiles —
    // a different algorithm agreeing on the answer (the median gate's
    // pattern); the rank at each crossing carries the same n_chars as
    // the histogram walk's first cum >= rank
    "quantiles_by_lang" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT lang,
        |MIN(CASE WHEN rn = (n + 3) // 4 THEN n_chars END) AS p25,
        |MIN(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS p50,
        |MIN(CASE WHEN rn = (3 * n + 3) // 4 THEN n_chars END) AS p75
        |FROM r
        |WHERE rn = (n + 3) // 4 OR rn = (n + 1) // 2
        |   OR rn = (3 * n + 3) // 4
        |GROUP BY lang""".stripMargin,
    "events_changepoint" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_id,
        |  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events),
        |st AS (
        |  SELECT user_id, ts, event_id,
        |  CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS srun,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS rn,
        |  CAST(SUM(c) OVER (PARTITION BY user_id) AS DOUBLE) AS tot,
        |  COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM base),
        |cs AS (
        |  SELECT user_id, ts, event_id, n,
        |  (srun - rn * (tot / n)) / 100.0 AS cusum FROM st)
        |SELECT user_id, ts AS cp_ts, cusum, CAST(n AS BIGINT) AS n_events
        |FROM (
        |  SELECT user_id, ts, cusum, n,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY abs(cusum) DESC, ts ASC, event_id ASC) AS rnk
        |  FROM cs) t WHERE rnk = 1""".stripMargin,
    "events_funnel" ->
      """SELECT date_trunc('hour', ts) AS hour_start,
        |CAST(COUNT(*) AS BIGINT) AS n_views,
        |CAST(SUM(CASE WHEN next_click_us - epoch_us(ts) <= 600000000
        |  THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM (
        |  SELECT *, min(CASE WHEN event_type = 'click'
        |      THEN epoch_us(ts) END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS next_click_us
        |  FROM events) t
        |WHERE event_type = 'view'
        |GROUP BY 1""".stripMargin,
    "events_retention" ->
      """WITH hu AS (
        |  SELECT DISTINCT user_id, date_trunc('hour', ts) AS h
        |  FROM events)
        |SELECT a.h AS hour_start, CAST(COUNT(*) AS BIGINT) AS n_retained
        |FROM hu a JOIN hu b
        |ON a.user_id = b.user_id AND b.h = a.h + INTERVAL 1 HOUR
        |GROUP BY a.h""".stripMargin,
    // z-ordering is pure layout: the oracle is the same 2-D range
    // aggregate over the PLAIN table
    "zorder_prune" ->
      """WITH b AS (
        |  SELECT CAST(floor(max(user_id)*2/10.0) AS BIGINT) AS lo,
        |         CAST(floor(max(user_id)*4/10.0) AS BIGINT) AS hi
        |  FROM events)
        |SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |  AS sum_value,
        |CAST(min(user_id) AS BIGINT) AS min_uid,
        |CAST(max(user_id) AS BIGINT) AS max_uid
        |FROM events, b
        |WHERE user_id BETWEEN b.lo AND b.hi
        |  AND value BETWEEN 100.0 AND 250.0""".stripMargin,
    // equi-depth layout, identical answers — same replay with the
    // zorder_prune_eq range constants
    "zorder_prune_eq" ->
      """WITH b AS (
        |  SELECT CAST(floor(max(user_id)*3/10.0) AS BIGINT) AS lo,
        |         CAST(floor(max(user_id)*6/10.0) AS BIGINT) AS hi
        |  FROM events)
        |SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
        |CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
        |  AS sum_value,
        |CAST(min(user_id) AS BIGINT) AS min_uid,
        |CAST(max(user_id) AS BIGINT) AS max_uid
        |FROM events, b
        |WHERE user_id BETWEEN b.lo AND b.hi
        |  AND value BETWEEN 50.0 AND 200.0""".stripMargin,
    "user_growth" ->
      """WITH fd AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS day
        |  FROM events GROUP BY 1),
        |nu AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        |  FROM fd GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM nu""".stripMargin,
    "events_sessions" ->
      """SELECT user_id, CAST(SUM(brk) AS BIGINT) AS n_sessions,
        |CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM (SELECT user_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
        |  THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
        |GROUP BY user_id""".stripMargin,
    "dedup_report" ->
      """WITH sig AS (
        |  SELECT lang, md5(text) AS h,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split(lower(text), ' '))), ' ')) AS fp
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_exact,
        |CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_fp,
        |CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE) / COUNT(*)
        |  AS exact_dup_rate,
        |CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*)
        |  AS fuzzy_dup_rate
        |FROM sig GROUP BY lang""".stripMargin,
    "bigram_commonness" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i+1])) AS b
        |  FROM w),
        |f AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM bg GROUP BY b)
        |SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |CAST(SUM(f.n) AS DOUBLE) / COUNT(*) AS mean_bg_freq
        |FROM bg JOIN f ON bg.b = f.b
        |GROUP BY bg.doc_id""".stripMargin,
    "bpe_merge_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents),
        |wf AS (SELECT word, count(*) AS f FROM w
        |       WHERE length(word) > 0 GROUP BY 1),
        |p AS (SELECT substr(word, CAST(i AS INT), 1) AS a,
        |             substr(word, CAST(i AS INT) + 1, 1) AS b, f
        |      FROM wf, unnest(generate_series(1, length(word) - 1)) AS t(i)
        |      WHERE length(word) >= 2)
        |SELECT a, b, CAST(sum(f) AS BIGINT) AS cnt FROM p GROUP BY a, b
        |ORDER BY cnt DESC, a, b LIMIT 20""".stripMargin,
    // the generated 5-round CTE chain (pairs -> winner -> applied
    // vocabulary per round) — see BpeTrain.oracleSql
    "bpe_train" -> graft.operators.BpeTrain.oracleSql(5),
    "bpe_train_batched" ->
      graft.operators.BpeTrain.batchedOracleSql(rounds = 3, batch = 8),
    "bpe_encode_batched" ->
      graft.operators.BpeTrain.batchedEncodeOracleSql(rounds = 3,
        batch = 8, topK = 30),
    // same chain, final vocabulary exploded into weighted subword
    // frequencies
    "bpe_encode" -> graft.operators.BpeTrain.encodeOracleSql(5, 30),
    // the generated 3-round perceptron chain over the md5-nibble
    // feature matrix — see Perceptron.oracleSql; the feature CTE
    // mirrors the Spark tokenization (split on ' ', first md5 nibble)
    "perceptron_train" -> graft.operators.Perceptron.oracleSql(
      perceptronFeatCte, nFeatures = 16, iters = 3),
    // the same chain scored once more against the final weights and
    // folded into exact confusion counts
    "perceptron_ovr_confusion" ->
      graft.operators.Perceptron.ovrConfusionOracleSql(
        perceptronFeatMcCte, Seq("de", "en", "es", "fr", "zh"),
        nFeatures = 16, iters = 3),
    "perceptron_confusion" -> graft.operators.Perceptron.confusionOracleSql(
      perceptronFeatCte, nFeatures = 16, iters = 3),
    "colloc_lift" ->
      """WITH tok AS (
        |  SELECT string_split(lower(text), ' ') AS w FROM documents),
        |bg AS (SELECT w[CAST(i AS INT)] AS a, w[CAST(i AS INT) + 1] AS b
        |       FROM tok, unnest(generate_series(1, len(w) - 1)) AS t(i)
        |       WHERE len(w) >= 2),
        |cab AS (SELECT a, b, count(*) AS c_ab FROM bg
        |        WHERE length(a) > 0 AND length(b) > 0 GROUP BY 1, 2),
        |uw AS (SELECT unnest(string_split(lower(text), ' ')) AS word
        |       FROM documents),
        |uni AS (SELECT word, count(*) AS c FROM uw
        |        WHERE length(word) > 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni)
        |SELECT cab.a AS a, cab.b AS b, CAST(c_ab AS BIGINT) AS c_ab,
        |       (CAST(c_ab AS DOUBLE) * n) /
        |       (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS lift
        |FROM cab
        |JOIN uni ua ON ua.word = cab.a
        |JOIN uni ub ON ub.word = cab.b
        |CROSS JOIN tot
        |WHERE c_ab >= 5
        |ORDER BY lift DESC, a, b LIMIT 30""".stripMargin,
    "oov_rate" ->
      """WITH toks AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok,
        |    row_number() OVER (ORDER BY COUNT(*) DESC, tok) AS rank
        |    FROM toks GROUP BY tok) r
        |  WHERE rank <= 40)
        |SELECT t.lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov,
        |CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS DOUBLE) / COUNT(*)
        |  AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY t.lang""".stripMargin,
    "corpus_split" ->
      """WITH b AS (
        |  SELECT lang,
        |  (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16 +
        |  (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS bucket
        |  FROM documents)
        |SELECT lang,
        |CASE WHEN bucket < 204 THEN 'train'
        |     WHEN bucket < 230 THEN 'valid' ELSE 'test' END AS split,
        |CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM b GROUP BY 1, 2""".stripMargin,
    // identical moment-sum / division / sqrt chain -> identical flags
    "events_anomaly" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT hour_start, event_type, cnt,
        |  COUNT(cnt) OVER win AS n,
        |  SUM(cnt) OVER win AS s1,
        |  SUM(cnt*cnt) OVER win AS s2
        |  FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hour_start
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT hour_start, event_type, CAST(cnt AS BIGINT) AS cnt,
        |CAST(cnt > s1/n + 3.0*sqrt(greatest(s2/n - (s1/n)*(s1/n), 0.0))
        |  AS BIGINT) AS spike
        |FROM w WHERE n >= 12""".stripMargin,
    "events_session_window" ->
      """WITH m AS (
        |  SELECT user_id, ts,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
        |  THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT user_id, ts,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM m)
        |SELECT user_id, MIN(ts) AS session_start,
        |MAX(ts) + INTERVAL '5 minutes' AS session_end,
        |CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, grp""".stripMargin,
    "events_resample" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |  CAST(COUNT(*) AS BIGINT) AS cnt,
        |  SUM(CAST(value AS DECIMAL(18,6))) AS sv
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT date_trunc('hour', min(ts)) AS lo,
        |             date_trunc('hour', max(ts)) AS hi FROM events),
        |t AS (SELECT DISTINCT event_type FROM events),
        |spine AS (
        |  SELECT t.event_type,
        |  unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS hour
        |  FROM t, b),
        |j AS (
        |  SELECT s.event_type, s.hour, COALESCE(h.cnt, 0) AS cnt, h.sv
        |  FROM spine s LEFT JOIN hourly h
        |  ON h.event_type = s.event_type AND h.hour = s.hour)
        |SELECT event_type, hour, cnt,
        |CAST(CAST(last_value(sv IGNORE NULLS) OVER (
        |  PARTITION BY event_type ORDER BY hour
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS VARCHAR) AS DOUBLE) AS v_ffill
        |FROM j""".stripMargin,
    "ngram_dup_spans" ->
      """WITH g AS (
        |  SELECT doc_id, substr(text, CAST(i AS INT), 30) AS gram
        |  FROM documents, unnest(generate_series(1, length(text) - 29)) AS t(i)
        |  WHERE length(text) >= 30),
        |dg AS (SELECT DISTINCT doc_id, gram FROM g),
        |freq AS (SELECT gram FROM dg GROUP BY gram
        |         HAVING count(*) BETWEEN 2 AND 8)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |CAST(count(*) AS BIGINT) AS n_shared
        |FROM dg a JOIN freq USING (gram) JOIN dg b USING (gram)
        |WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2
        |HAVING count(*) >= 20""".stripMargin,
    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks)
        |SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM toks, tot GROUP BY token, tot.total
        |HAVING COUNT(*) * 40 > tot.total""".stripMargin,
    "bm25_topk" ->
      """WITH dl AS (
        |  SELECT doc_id,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
        |  FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |              CAST(SUM(dl) AS BIGINT) AS total FROM dl),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |       FROM (SELECT doc_id,
        |             unnest(string_split(lower(text), ' ')) AS term
        |             FROM documents) toks
        |       WHERE term IN ('spark', 'stream', 'join')
        |       GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        |       FROM tf GROUP BY term),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |  ((CAST(st.n_docs - df.df AS DOUBLE) + 0.5)
        |     / (CAST(df.df AS DOUBLE) + 0.5))
        |  * ((CAST(tf.tf AS DOUBLE) * 2.2)
        |     / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25
        |        + (0.75 * CAST(dl.dl AS DOUBLE))
        |          / (CAST(st.total AS DOUBLE) / CAST(st.n_docs AS DOUBLE)))))
        |    AS s
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
        |agg AS (
        |  SELECT doc_id,
        |  COALESCE(SUM(CASE WHEN term = 'spark' THEN s END), 0.0)
        |  + COALESCE(SUM(CASE WHEN term = 'stream' THEN s END), 0.0)
        |  + COALESCE(SUM(CASE WHEN term = 'join' THEN s END), 0.0) AS score
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, score,
        |CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |FROM agg ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
  )
}
