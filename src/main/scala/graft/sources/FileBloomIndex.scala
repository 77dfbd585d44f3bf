package graft.sources

import graft.functions.BloomAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import scala.collection.concurrent.TrieMap

/** File-level bloom index: per-bucket bloom filters over a
  * high-cardinality key column, for point lookups on a key the
  * physical LAYOUT is not organized by.
  *
  * Zone maps (ZoneMapPruning) and z-order boxes (ZOrder) skip files
  * via min/max ranges — useless for equality on a key whose values
  * span every file's range (uniformly distributed ids, content
  * hashes, URLs: every file's [min,max] contains every probe). The
  * bloom sidecar answers "can this file contain key k?" by hash
  * membership instead: at 100 TB a doc-id lookup reads the
  * metadata-sized sidecar plus the one or two data files whose bloom
  * matches, not the corpus. This is the Delta/Iceberg bloom-index
  * shape, with the sidecar as an explicit parquet table.
  *
  * Layout: `path/data/fbib=<b>/` parquet buckets (placement is the
  * CALLER's expression — typically ingest batch or content hash,
  * deliberately uncorrelated with the key) + a SHARDED sidecar
  * `path/_blooms.d/<lo>-<hi>/` — one parquet dir per contiguous
  * bucket range, rows (bucket, bloom, expected_items, fpp), built
  * with the mergeable [[BloomAgg]] (map-side partials, fixed-size
  * state).
  *
  * Why sharded (the stats-sidecar v3 lesson, round 13): a
  * single-file sidecar makes every APPEND an O(all buckets) rewrite
  * — at 10⁵ buckets × KB-scale filters that is GBs of sidecar IO
  * for an O(batch) ingest. Range shards bound the append to the
  * shards its batch touches; untouched shards are never read or
  * rewritten (byte-identical across appends, pinned in
  * FileBloomIndexSpec). The legacy single `path/_blooms` format (v1)
  * stays readable; the first append to a v1 index reshards it —
  * a one-time rewrite costing exactly what every v1 append already
  * cost.
  *
  * Read paths deserialize each shard once per JVM: a
  * fingerprint-guarded memo (file names + mtimes + lengths from one
  * listStatus — metadata only, zero data bytes) serves repeated
  * lookups, and an append invalidates exactly the shards it swapped.
  *
  * The bloom law (no false negatives) makes pruning EXACT on the
  * miss side: a bucket the filter rejects provably lacks the key, so
  * lookup == full scan always (pinned in FileBloomIndexSpec along
  * with the pruning itself via `inputFiles`).
  *
  * Crash discipline (single-writer): [[write]] builds the sidecar
  * from the data files READ BACK, so the blooms cover exactly what
  * the files contain — even a non-deterministic layout expression
  * cannot divorce them. [[append]] updates the sidecar BEFORE
  * appending data: every crash window leaves either the old
  * consistent shards or shards that over-approximate (extra
  * candidates are false POSITIVES — harmless; the batch rows simply
  * are not in the index yet and the caller retries; partial
  * multi-shard application is safe for the same reason, since each
  * shard's merge is independently a superset of its current state).
  * Each shard swap goes through `<name>.next`/`<name>.old` renames
  * with roll-forward/roll-back healing on the read side — no window
  * where the index is unreadable.
  */
object FileBloomIndex {

  /** Buckets per sidecar shard. Appends derive the live value from
    * the existing shard names, so it only matters at [[write]] time:
    * pick it so (typical batch's touched buckets) ≪ (total buckets /
    * bucketsPerShard) × bucketsPerShard — i.e. a daily batch touches
    * a few shards of many.
    */
  val DefaultBucketsPerShard = 8

  /** Write `df` bucketed by `layout` with a per-bucket bloom over
    * `keyCol` (rendered as string). `expectedPerBucket` sizes every
    * filter identically — a requirement of partial-merge
    * compatibility, not a nicety. The blooms are aggregated from the
    * written files read back: bloom/data consistency by construction.
    */
  def write(df: DataFrame, keyCol: String, layout: org.apache.spark.sql.Column,
      path: String, expectedPerBucket: Long, fpp: Double = 0.01,
      bucketsPerShard: Int = DefaultBucketsPerShard): Unit = {
    require(bucketsPerShard >= 1, s"bucketsPerShard=$bucketsPerShard")
    df.withColumn("fbib", layout)
      .repartition(col("fbib"))
      .write.partitionBy("fbib").mode("overwrite").parquet(s"$path/data")
    val blooms = df.sparkSession.read.parquet(s"$path/data")
      .groupBy(col("fbib").cast("int").as("bucket"))
      .agg(BloomAgg.bloom_agg(col(keyCol).cast("string"),
        expectedPerBucket, fpp).as("bloom"))
      // filter params AND the key column ride in the sidecar so
      // appends and the tombstone purge need no out-of-band knowledge
      .withColumn("expected_items", lit(expectedPerBucket))
      .withColumn("fpp", lit(fpp))
      .withColumn("key_col", lit(keyCol))
    val fs = fsFor(df.sparkSession, path)
    val staged = stageShards(blooms, path, bucketsPerShard)
    // fresh build: assemble the COMPLETE new root under _blooms.stage,
    // clear any previous sidecar (either format), then adopt the stage
    // with ONE rename — readers see the old sidecar, nothing (loud), or
    // the complete new root, never a partial shard set (a crash inside
    // a per-shard adoption loop would otherwise serve partial filters
    // silently = false negatives)
    val stage = assembleStage(fs, path, staged, bucketsPerShard)
    Seq("_blooms", "_blooms.next", "_blooms.old")
      .foreach(n => fs.delete(hp(s"$path/$n"), true))
    val root = shardRoot(path)
    fs.delete(root, true)
    checkedRename(fs, stage, root)
    // a rebuild may DROP shards whose stale cached filters would
    // otherwise linger forever (the fingerprint guard only covers
    // shards that still exist)
    filterMemo.keys.filter(_._1 == path).foreach(filterMemo.remove)
  }

  /** Incremental ingest: MERGE the batch's blooms into the sidecar
    * shards its buckets land in, then append the batch into the
    * existing bucket dirs (new part files only — untouched bucket
    * files AND untouched sidecar shards stay byte-identical, both
    * pinned in FileBloomIndexSpec). Only the new batch is scanned
    * plus the touched shards' current rows; the merge is the bitwise
    * OR of bit-compatible filters, so each merged shard carries the
    * blooms a one-shot rebuild over the union would (bloom bits are a
    * deterministic function of the item SET — also pinned).
    * Shard-first ordering is the crash discipline: a crash anywhere
    * before the data append leaves every shard either old-consistent
    * or merged (over-approximating — false positives only; the
    * no-false-negative law cannot break), and the replayed batch
    * re-merges idempotently. `layout` must be DETERMINISTIC here — it
    * places the batch rows and keys the batch blooms in two separate
    * jobs.
    */
  def append(batch: DataFrame, keyCol: String,
      layout: org.apache.spark.sql.Column, path: String): Unit = {
    val spark = batch.sparkSession
    upgradeV1(spark, path, keyCol)
    val fs = fsFor(spark, path)
    val shards = listShards(fs, path)
    require(shards.nonEmpty, s"no bloom sidecar at $path — write() first")
    val bps = shards.head._2
    val params = spark.read.parquet(shards.head._3.toString)
      .select("expected_items", "fpp").head()
    val expected = params.getLong(0)
    val fppV = params.getDouble(1)
    val withB = batch.withColumn("fbib", layout)
    val fresh = withB
      .groupBy(col("fbib").cast("int").as("bucket"))
      .agg(BloomAgg.bloom_agg(col(keyCol).cast("string"),
        expected, fppV).as("bloom"))
      .collect().map(r =>
        r.getAs[Int]("bucket") -> r.getAs[Array[Byte]]("bloom")).toMap
    if (fresh.nonEmpty) {
      val touchedLos = fresh.keySet.map(b => loOf(b, bps))
      // current rows of the TOUCHED shards only — the whole point
      val existingTouched: Map[Int, Array[Byte]] = {
        val dirs = shards.collect {
          case (lo, _, p) if touchedLos(lo) => p.toString }
        if (dirs.isEmpty) Map.empty
        else spark.read.parquet(dirs: _*).collect()
          .map(r => r.getAs[Int]("bucket") ->
            r.getAs[Array[Byte]]("bloom")).toMap
      }
      val merged = (existingTouched.keySet ++ fresh.keySet).toSeq.map { b =>
        (b, (existingTouched.get(b), fresh.get(b)) match {
          case (Some(old), Some(nb)) =>
            val f = BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(old))
            f.mergeInPlace(BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(nb)))
            val bos = new java.io.ByteArrayOutputStream()
            f.writeTo(bos)
            bos.toByteArray
          case (Some(old), None) => old
          case (None, Some(nb)) => nb
          case (None, None) => sys.error("unreachable")
        })
      }
      import spark.implicits._
      val mergedDf = merged.toDF("bucket", "bloom")
        .withColumn("expected_items", lit(expected))
        .withColumn("fpp", lit(fppV))
        .withColumn("key_col", lit(keyCol))
      // stage EVERY touched shard's replacement as <name>.next before
      // swapping ANY — a .next, once present, is always complete
      // (rename is atomic) and always safe to adopt (superset merge)
      val staged = stageShards(mergedDf, path, bps)
      staged.foreach { case (lo, tmpDir) =>
        val next = nextPath(path, lo, bps)
        fs.delete(next, true) // stale residue from an older crash
        checkedRename(fs, tmpDir, next)
      }
      fs.delete(hp(tmpRoot(path)), true)
      staged.foreach { case (lo, _) => swapShard(fs, path, lo, bps) }
    }
    // data LAST: see the crash-discipline note above
    withB.repartition(col("fbib"))
      .write.partitionBy("fbib").mode("append").parquet(s"$path/data")
  }

  /** TOMBSTONE delete — the deletion-vector verb mirrored from the IVF
    * index ([[graft.operators.SimilarityOps.deleteFromIvfIndex]]):
    * bloom bits cannot be UNSET, so deleting appends the key strings
    * to a `_tombstones` sidecar (one metadata-sized file per delete
    * batch; no data or sidecar shard is read or rewritten — a delete
    * is O(batch) like an append). Every read path masks results
    * against the broadcast tombstone set, and [[compact]] physically
    * PURGES: only the buckets actually holding deleted keys rewrite,
    * their blooms REBUILD from the surviving rows (bit-compatible
    * params, so shard merges still equal a fresh build over the
    * survivors), only the touched shards swap, and the tombstones
    * clear. Tombstone growth is bounded by compaction cadence — what
    * keeps the mask broadcast small at any index size.
    *
    * Contract (the IVF ingest rule): delete WINS over a replayed or
    * re-appended insert — [[graft.streaming.BloomStreams]] drops
    * tombstoned keys from every batch, so re-ingesting a deleted key
    * requires purging first. Deleting an absent key is a harmless
    * no-op row.
    */
  def delete(spark: SparkSession, path: String, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "empty delete keys")
    require(!keys.contains(null), "null keys are never indexed — " +
      "nothing to delete")
    import spark.implicits._
    keys.distinct.toDF("k")
      .coalesce(1)
      .write.mode("append").parquet(s"$path/_tombstones")
  }

  /** The `_tombstones` sidecar as a distinct key set; None when the
    * index has no pending deletes.
    */
  private[graft] def tombstonesDf(spark: SparkSession,
      path: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(s"$path/_tombstones")
      df.schema // force resolution so a missing dir lands HERE
      Some(df.select("k").distinct())
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Mask tombstoned keys out of a frame whose `keyExpr` renders the
    * index key as string — the one mask every read path shares.
    */
  private def maskTombstones(spark: SparkSession, path: String,
      df: DataFrame, keyExpr: org.apache.spark.sql.Column): DataFrame =
    tombstonesDf(spark, path) match {
      case Some(ts) =>
        df.join(broadcast(ts.withColumnRenamed("k", "_ts_k")),
          keyExpr === col("_ts_k"), "left_anti")
      case None => df
    }

  /** Compact the small-file debt appends accrue — and physically PURGE
    * pending [[delete]] tombstones first: the buckets holding deleted
    * keys are located through the (memoized) blooms plus an exact
    * confirm read, rewritten without the dead rows (emptied bucket
    * dirs removed), their blooms REBUILT from the surviving rows, the
    * touched sidecar shards swapped, and `_tombstones` cleared — after
    * which the index is byte-equivalent to one never containing the
    * deleted rows and reads stop paying the mask. Crash ordering:
    * data rewrite, then sidecar shards, then the tombstone clear LAST
    * — every intermediate state either still masks or only
    * over-approximates.
    *
    * Then buckets holding more than `maxFilesPerBucket` part files
    * rewrite as one file each (localCheckpoint materializes them first
    * — Spark rightly refuses to overwrite a path it is still reading —
    * then dynamic partition overwrite replaces just the rewritten
    * buckets). Content is preserved row-for-row; untouched buckets and
    * sidecar shards stay byte-identical (bloom bits are a function of
    * the item set, which file compaction does not change) — all pinned
    * in FileBloomIndexSpec.
    */
  def compact(spark: SparkSession, path: String,
      maxFilesPerBucket: Int = 1): Unit = {
    require(maxFilesPerBucket >= 1, s"maxFilesPerBucket=$maxFilesPerBucket")
    val fs = fsFor(spark, path)
    purgeTombstones(spark, fs, path)
    val dataRoot = hp(s"$path/data")
    def parquetCount(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    val fat = fs.listStatus(dataRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("fbib="))
      .filter(s => parquetCount(s.getPath) > maxFilesPerBucket)
      .map(_.getPath.getName.stripPrefix("fbib=").toInt)
    if (fat.nonEmpty) {
      spark.read.parquet(s"$path/data")
        .filter(col("fbib").isin(fat: _*)) // partition-pruned read
        .localCheckpoint()
        .repartition(fat.length, col("fbib")) // ~one file per bucket
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("fbib").parquet(s"$path/data")
    }
  }

  /** The purge half of [[compact]]; see its scaladoc. The key column
    * comes from the sidecar itself (`key_col` rides in every shard,
    * like expected_items/fpp — lifecycle verbs need no out-of-band
    * knowledge), so purge works from the stored state alone.
    */
  private def purgeTombstones(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val tsPath = hp(s"$path/_tombstones")
    if (!fs.exists(tsPath)) return
    healV1(fs, path)
    if (v1Authoritative(fs, path))
      // covers both the legacy v1 format and the coexistence state of
      // an incomplete upgrade — either way the shard root is not yet
      // trustworthy, and purging against it could strand dead rows
      throw new IllegalArgumentException(
        s"$path carries pending tombstones on a legacy v1 sidecar " +
          "(or an incomplete upgrade) — run append once (or rebuild " +
          "with write()) to finish the sharded format, then compact")
    val shards = listShards(fs, path)
    if (shards.isEmpty)
      throw new IllegalArgumentException(
        s"no bloom sidecar at $path — write() first")
    val head = spark.read.parquet(shards.head._3.toString)
    require(head.columns.contains("key_col"),
      s"$path sidecar predates key_col — rebuild with write() (or " +
        "append once) before purging tombstones")
    val params = head.select("expected_items", "fpp", "key_col").head()
    require(!params.isNullAt(2),
      s"$path sidecar has a null key_col (mixed-era shards?) — " +
        "rebuild with write() before purging tombstones")
    val expected = params.getLong(0)
    val fppV = params.getDouble(1)
    val keyCol = params.getString(2)
    val ts = spark.read.parquet(s"$path/_tombstones")
      .select("k").distinct().localCheckpoint()
    // this verb is about to delete data dirs: drop the listing memo
    // NOW so no same-JVM reader (or this method) can serve a stale
    // bucket set during the mutation window; the sidecar swap below
    // rotates the digest, so post-purge readers re-list exactly once
    presentMemo.remove(path)
    // locate: bloom-candidate buckets for the tombstoned keys
    // (executor-side, a superset), then an exact pruned confirm —
    // only buckets PROVABLY holding dead rows rewrite
    val (fpDigest0, filters0) = loadFiltersFp(spark, path)
    val cands = candidateBucketsFor(spark, filters0, ts)
    val candPaths = existingBucketPaths(fs, path, cands, fpDigest0)
    val touched: Array[Int] =
      if (candPaths.isEmpty) Array.empty
      else {
        val read = spark.read.option("basePath", s"$path/data")
          .parquet(candPaths: _*)
        read.join(broadcast(ts),
            read(keyCol).cast("string") === ts("k"))
          .select(col("fbib").cast("int")).distinct()
          .collect().map(_.getInt(0)).sorted
      }
    if (touched.nonEmpty) {
      // (1) DATA: rewrite only the touched buckets without the dead
      // rows (dynamic overwrite replaces exactly the partitions it
      // writes; buckets the purge EMPTIES are deleted in step (3),
      // AFTER the sidecar swap — until then their stale files stay
      // masked by the tombstones, so every crash state is consistent)
      val touchedRead = spark.read.option("basePath", s"$path/data")
        .parquet(touched.map(b => s"$path/data/fbib=$b").toSeq: _*)
      val kept = touchedRead.join(
          broadcast(ts.withColumnRenamed("k", "_ts_k")),
          touchedRead(keyCol).cast("string") === col("_ts_k"),
          "left_anti")
        .localCheckpoint() // materialize BEFORE overwriting the source
      val surviving = kept.select(col("fbib").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
      if (surviving.nonEmpty)
        kept.repartition(surviving.size, col("fbib"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("fbib").parquet(s"$path/data")
      // (2) SIDECAR: rebuild the touched buckets' blooms from the
      // REWRITTEN files read back (the write()-time consistency
      // discipline), replace them inside their shards, swap only
      // those shards; a shard left bucket-less is deleted outright
      // (with its .next/.old residues — a stale residue healed after
      // the delete would resurrect blooms for removed buckets)
      val freshBlooms: Map[Int, Array[Byte]] =
        if (surviving.isEmpty) Map.empty
        else spark.read.option("basePath", s"$path/data")
          .parquet(surviving.toSeq.sorted
            .map(b => s"$path/data/fbib=$b"): _*)
          .groupBy(col("fbib").cast("int").as("bucket"))
          .agg(BloomAgg.bloom_agg(col(keyCol).cast("string"),
            expected, fppV).as("bloom"))
          .collect().map(r =>
            r.getAs[Int]("bucket") -> r.getAs[Array[Byte]]("bloom")).toMap
      val bps = shards.head._2
      val touchedLos = touched.map(b => loOf(b, bps)).toSet
      val oldTouched: Map[Int, Array[Byte]] = {
        val dirs = shards.collect {
          case (lo, _, p) if touchedLos(lo) => p.toString }
        spark.read.parquet(dirs: _*).collect()
          .map(r => r.getAs[Int]("bucket") ->
            r.getAs[Array[Byte]]("bloom")).toMap
      }
      def dropShard(lo: Int): Unit = {
        fs.delete(shardPath(path, lo, bps), true)
        fs.delete(nextPath(path, lo, bps), true)
        fs.delete(oldPath(path, lo, bps), true)
        filterMemo.remove((path, shardName(lo, bps)))
      }
      val newRows = (oldTouched -- touched) ++ freshBlooms
      import spark.implicits._
      if (newRows.nonEmpty) {
        val mergedDf = newRows.toSeq.toDF("bucket", "bloom")
          .withColumn("expected_items", lit(expected))
          .withColumn("fpp", lit(fppV))
          .withColumn("key_col", lit(keyCol))
        val staged = stageShards(mergedDf, path, bps)
        staged.foreach { case (lo, tmpDir) =>
          val next = nextPath(path, lo, bps)
          fs.delete(next, true)
          checkedRename(fs, tmpDir, next)
        }
        fs.delete(hp(tmpRoot(path)), true)
        staged.foreach { case (lo, _) => swapShard(fs, path, lo, bps) }
        (touchedLos -- staged.map(_._1).toSet).foreach(dropShard)
      } else
        touchedLos.foreach(dropShard)
    }
    // (3) now that no bloom names them, drop the emptied bucket dirs —
    // and sweep any ORPHAN dir a crashed earlier purge left behind (a
    // data bucket without a bloom row is unreachable by construction:
    // appends write the sidecar first). UNCONDITIONAL — a replayed
    // compact whose new blooms no longer name the crashed run's
    // emptied bucket finds touched empty, and the sweep is then the
    // only path that heals the orphan. A whole-index purge legally
    // leaves ZERO shards (loadFilters serves an empty filter set off
    // the still-present _blooms.d root).
    val liveBuckets = loadFilters(spark, path).map(_._1).toSet
    fs.listStatus(hp(s"$path/data")).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("fbib="))
      .map(s => s.getPath.getName.stripPrefix("fbib=").toInt)
      .filterNot(liveBuckets)
      .foreach(b => fs.delete(hp(s"$path/data/fbib=$b"), true))
    // a reader may have re-listed (and memoized) between the sidecar
    // swap and the deletes above — drop the entry once more so the
    // post-purge state is re-listed exactly once
    presentMemo.remove(path)
    // (4) tombstones LAST: every earlier crash state still masks
    fs.delete(tsPath, true)
  }

  /** Candidate buckets for a one-column ("k") frame of key strings —
    * executor-side membership tests against the broadcast memoized
    * filters, shared by [[existingKeysDf]] and the tombstone purge.
    */
  private def candidateBucketsFor(spark: SparkSession,
      filters: Array[(Int, BloomFilter)], keysDf: DataFrame): Array[Int] = {
    val bc = spark.sparkContext.broadcast(filters)
    val candOf = udf((k: String) =>
      bc.value.collect { case (b, f) if f.mightContainString(k) => b })
    keysDf.select(explode(candOf(col("k"))).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
  }

  /** Data-root listing memo for [[existingBucketPaths]], keyed by the
    * sidecar fingerprint digest (see [[loadFiltersFp]]): the bucket
    * dir SET only changes through verbs that also swap sidecar shard
    * dirs, so an unchanged digest serves the listing with zero
    * metadata round-trips. The purge verb additionally drops the
    * entry around its data-dir deletes (same-JVM crash window).
    */
  private val presentMemo =
    TrieMap.empty[String, (String, Set[String])]

  /** Bucket dirs that actually EXIST, as read paths: a bloom may
    * transiently name a bucket whose dir a purge already removed (the
    * crash window between the data delete and the tombstone clear) —
    * a missing dir provably holds no rows, so skipping it preserves
    * exactness where a blind read would fail with PATH_NOT_FOUND.
    */
  private def existingBucketPaths(fs: org.apache.hadoop.fs.FileSystem,
      path: String, buckets: Seq[Int], fpDigest: String): Seq[String] = {
    if (buckets.isEmpty) return Seq.empty
    val present = presentMemo.get(path) match {
      case Some((d, p)) if d == fpDigest => p
      case _ =>
        // ONE listStatus of the data root (not one exists() RPC per
        // candidate — on an object store that would charge every
        // lookup a metadata round-trip per bucket, forever, to guard
        // a rare crash window), then memoized until the sidecar
        // fingerprints move
        val p = fs.listStatus(hp(s"$path/data")).toSeq
          .map(_.getPath.getName).toSet
        presentMemo.put(path, (fpDigest, p))
        p
    }
    buckets.collect { case b if present(s"fbib=$b") =>
      s"$path/data/fbib=$b" }
  }

  // ---- sharded sidecar plumbing ----

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)
  private def shardRoot(path: String) = hp(s"$path/_blooms.d")
  private def tmpRoot(path: String) = s"$path/_blooms.tmp"
  private def loOf(bucket: Int, bps: Int): Int =
    Math.floorDiv(bucket, bps) * bps
  private def shardName(lo: Int, bps: Int) = s"$lo-${lo + bps - 1}"
  private def shardPath(path: String, lo: Int, bps: Int) =
    hp(s"$path/_blooms.d/${shardName(lo, bps)}")
  private def nextPath(path: String, lo: Int, bps: Int) =
    hp(s"$path/_blooms.d/${shardName(lo, bps)}.next")
  private def oldPath(path: String, lo: Int, bps: Int) =
    hp(s"$path/_blooms.d/${shardName(lo, bps)}.old")

  private def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def checkedRename(fs: org.apache.hadoop.fs.FileSystem,
      from: org.apache.hadoop.fs.Path,
      to: org.apache.hadoop.fs.Path): Unit =
    // a silently-failed rename would mask a half-applied swap as
    // success — the one failure mode the .next/.old discipline cannot
    // heal, so it must be LOUD (the read side then heals the residues).
    // For UNCONTENDED staging renames only; contended heal/swap steps
    // use [[renameOrHealed]].
    require(fs.rename(from, to), s"rename failed: $from -> $to")

  /** Rename for CONTENDED heal/swap steps: the single-writer contract
    * covers writers, but every READ heals residues too, so two
    * concurrent lookups (or a lookup racing an append's swap) may
    * attempt the same rename — the loser's rename returns false while
    * the winner has already produced the identical destination. Losing
    * that race is success; a failed rename with NO destination is the
    * real, loud failure.
    */
  private def renameOrHealed(fs: org.apache.hadoop.fs.FileSystem,
      from: org.apache.hadoop.fs.Path,
      to: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(from, to))
      require(fs.exists(to),
        s"rename failed and destination missing: $from -> $to")

  /** Assemble staged shard dirs into a complete replacement root at
    * `_blooms.stage` (final shard names, ready for the one-rename
    * adoption) and clear the tmp root. Every rename here moves within
    * staging space: a crash leaves only inert `_blooms.tmp` /
    * `_blooms.stage` residue that the next attempt clears — the live
    * `_blooms.d` is never touched until the single adopting rename.
    */
  private def assembleStage(fs: org.apache.hadoop.fs.FileSystem,
      path: String, staged: Seq[(Int, org.apache.hadoop.fs.Path)],
      bps: Int): org.apache.hadoop.fs.Path = {
    val stage = hp(s"$path/_blooms.stage")
    fs.delete(stage, true) // residue from a crashed earlier attempt
    require(fs.mkdirs(stage), s"cannot create $stage")
    staged.foreach { case (lo, tmpDir) =>
      checkedRename(fs, tmpDir,
        new org.apache.hadoop.fs.Path(stage, shardName(lo, bps)))
    }
    fs.delete(hp(tmpRoot(path)), true)
    stage
  }

  /** Write the blooms rows into one parquet dir per shard under the
    * tmp root; returns (shardLo, tmpShardDir) pairs. Distributed
    * (partitionBy) — nothing sidecar-sized crosses the driver.
    */
  private def stageShards(blooms: DataFrame, path: String,
      bps: Int): Seq[(Int, org.apache.hadoop.fs.Path)] = {
    val tmp = tmpRoot(path)
    blooms
      .withColumn("shard", (col("bucket") - pmod(col("bucket"), lit(bps))))
      .repartition(col("shard")).sortWithinPartitions("bucket")
      .write.mode("overwrite").partitionBy("shard").parquet(tmp)
    val fs = fsFor(blooms.sparkSession, path)
    fs.listStatus(hp(tmp)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .map(s => (s.getPath.getName.stripPrefix("shard=").toInt, s.getPath))
      .sortBy(_._1)
  }

  /** cur -> `<name>.old`, `<name>.next` -> cur, drop old — the v1
    * whole-sidecar swap applied per shard; [[healShards]] completes an
    * interrupted swap from either side.
    */
  private def swapShard(fs: org.apache.hadoop.fs.FileSystem, path: String,
      lo: Int, bps: Int): Unit = {
    val cur = shardPath(path, lo, bps)
    val next = nextPath(path, lo, bps)
    val oldP = oldPath(path, lo, bps)
    if (fs.exists(oldP)) fs.delete(oldP, true) // stale residue
    // a concurrent reader's heal can complete the swap from under us
    // (adopt next once cur is moved aside): a failed rename whose
    // destination exists means the heal won with identical bytes
    if (fs.exists(cur) && !fs.rename(cur, oldP))
      require(!fs.exists(cur), s"rename failed: $cur -> $oldP")
    renameOrHealed(fs, next, cur)
    fs.delete(oldP, true)
  }

  /** Roll interrupted shard swaps forward (a fully-present `.next` is
    * always safe to adopt — it only over-approximates) or back, and
    * clear completed swaps' leftover `.old` copies. Cheap when clean:
    * one listStatus, no renames.
    */
  private def healShards(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val root = shardRoot(path)
    if (!fs.exists(root)) return
    val names = fs.listStatus(root).map(_.getPath.getName).toSet
    names.filter(_.endsWith(".next")).foreach { n =>
      val cur = n.stripSuffix(".next")
      // cur present: serving it stays correct (the writer re-stages on
      // replay) — leave residues alone, matching the v1 heal contract
      if (!names(cur)) {
        renameOrHealed(fs, hp(s"$root/$n"), hp(s"$root/$cur"))
        fs.delete(hp(s"$root/$cur.old"), true)
      }
    }
    names.filter(_.endsWith(".old")).foreach { n =>
      val cur = n.stripSuffix(".old")
      if (!names(cur) && !names(s"$cur.next"))
        renameOrHealed(fs, hp(s"$root/$n"), hp(s"$root/$cur"))
    }
  }

  /** Live shards as (lo, bucketsPerShard, dir), healed and sorted.
    * Empty when the index still carries (only) a v1 sidecar.
    */
  private def listShards(fs: org.apache.hadoop.fs.FileSystem, path: String)
      : Seq[(Int, Int, org.apache.hadoop.fs.Path)] = {
    healShards(fs, path)
    val root = shardRoot(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.matches("-?\\d+--?\\d+"))
      .map { s =>
        // lo may be negative: the separator is the first '-' past the
        // (possible) sign, never the last (hi can be negative too)
        val n = s.getPath.getName
        val cut = n.indexOf('-', 1)
        val lo = n.substring(0, cut).toInt
        val hi = n.substring(cut + 1).toInt
        (lo, hi - lo + 1, s.getPath)
      }
      .sortBy(_._1)
  }

  /** One-time reshard of a legacy single-file `_blooms` sidecar into
    * the sharded layout — costs one full sidecar rewrite, exactly
    * what every append to the v1 format already paid. The complete
    * resharded root is assembled under `_blooms.stage` and adopted
    * with ONE rename, and `_blooms` is deleted LAST: every crash
    * window leaves either the intact v1 alone, v1 + a complete root
    * (the COEXISTENCE state — v1 stays authoritative on every read
    * path and the next append redoes the reshard), or the finished
    * sharded state. No window serves a partial shard set.
    */
  private def upgradeV1(spark: SparkSession, path: String,
      keyCol: String): Unit = {
    val fs = fsFor(spark, path)
    healV1(fs, path)
    val hasV1 = fs.exists(hp(s"$path/_blooms"))
    if (fs.exists(shardRoot(path))) {
      if (!hasV1) return // fully upgraded (or natively sharded)
      // coexistence = incomplete upgrade (crash between the root
      // adoption and the v1 delete, or a partial root left by a
      // pre-atomic build): the intact _blooms is authoritative —
      // drop the root and redo the reshard from it
      fs.delete(shardRoot(path), true)
      filterMemo.keys.filter(_._1 == path).foreach(filterMemo.remove)
    }
    if (!hasV1) return
    val v1raw = spark.read.parquet(s"$path/_blooms")
    // v1 sidecars predate key_col: attach it during the reshard
    val v1 =
      if (v1raw.columns.contains("key_col")) v1raw
      else v1raw.withColumn("key_col", lit(keyCol))
    val staged = stageShards(v1, path, DefaultBucketsPerShard)
    val stage = assembleStage(fs, path, staged, DefaultBucketsPerShard)
    checkedRename(fs, stage, shardRoot(path))
    // residues first, the authoritative _blooms LAST — a crash here
    // leaves coexistence, which the next append redoes idempotently
    Seq("_blooms.next", "_blooms.old", "_blooms")
      .foreach(n => fs.delete(hp(s"$path/$n"), true))
    filterMemo.remove((path, "_blooms")) // the retired v1 entry
  }

  /** v1 whole-sidecar heal (legacy indexes only). */
  private def healV1(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val cur = hp(s"$path/_blooms")
    if (fs.exists(cur)) return
    val next = hp(s"$path/_blooms.next")
    val oldP = hp(s"$path/_blooms.old")
    if (fs.exists(next)) { renameOrHealed(fs, next, cur); fs.delete(oldP, true) }
    else if (fs.exists(oldP)) renameOrHealed(fs, oldP, cur)
  }

  /** `_blooms.d` + `_blooms` coexistence marks an INCOMPLETE upgrade
    * (the reshard adopted its root but crashed before the v1 delete,
    * or a pre-atomic build left a partial root): the v1 file is
    * authoritative until the next append finishes the upgrade, so
    * every read path checks this before trusting the shard root —
    * serving a possibly-partial shard set would break the
    * no-false-negative law silently.
    */
  private def v1Authoritative(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Boolean = fs.exists(hp(s"$path/_blooms"))

  /** All sidecar rows (bucket, bloom, expected_items, fpp), either
    * format — the inspection/test surface.
    */
  private[graft] def sidecarDf(spark: SparkSession, path: String): DataFrame = {
    val fs = fsFor(spark, path)
    val shards =
      if (v1Authoritative(fs, path)) Seq.empty else listShards(fs, path)
    if (shards.nonEmpty)
      spark.read.parquet(shards.map(_._3.toString): _*)
    else {
      healV1(fs, path)
      spark.read.parquet(s"$path/_blooms")
    }
  }

  // ---- per-JVM filter memo ----

  /** Deserialized filters per (index path, shard), guarded by the
    * shard's file fingerprint (names + mtimes + lengths from one
    * listStatus — metadata only): repeated lookups in a session read
    * ZERO sidecar data bytes (pinned in FileBloomIndexSpec), and an
    * append invalidates exactly the shards it swapped (the swap
    * replaces the shard dir, so every fingerprint facet changes).
    * BloomFilter reads are thread-safe (mightContain only reads the
    * bit array), so sharing one instance across queries is sound.
    */
  private val filterMemo =
    TrieMap.empty[(String, String), (Seq[(String, Long, Long)],
      Array[(Int, BloomFilter)])]

  private def fingerprint(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] =
    fs.listStatus(dir).toSeq
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen))
      .sortBy(_._1)

  private def loadDir(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, indexPath: String,
      dir: org.apache.hadoop.fs.Path): Array[(Int, BloomFilter)] = {
    val key = (indexPath, dir.getName)
    val fp = fingerprint(fs, dir)
    filterMemo.get(key) match {
      case Some((cachedFp, filters)) if cachedFp == fp => filters
      case _ =>
        val filters = spark.read.parquet(dir.toString).collect().map { r =>
          r.getAs[Int]("bucket") -> BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        }.sortBy(_._1)
        filterMemo.put(key, (fp, filters))
        filters
    }
  }

  /** Every bucket's filter, memoized per shard (see [[filterMemo]]).
    * Loud when the index has no sidecar in either format.
    */
  private[graft] def loadFilters(spark: SparkSession,
      path: String): Array[(Int, BloomFilter)] =
    loadFiltersFp(spark, path)._2

  /** [[loadFilters]] plus the sidecar FINGERPRINT DIGEST the filters
    * were validated against (every shard's name + file fingerprints,
    * already computed for the per-shard memo guard — no extra
    * metadata round-trip). The digest keys [[presentMemo]]: every
    * mutation that can change the data-bucket dir set (write, append,
    * tombstone purge) swaps or drops sidecar shard dirs in the same
    * operation, so an unchanged digest proves the bucket listing is
    * still current. Shards that MISS the filter memo are read in ONE
    * batched parquet job (a cold session used to pay one listing +
    * footer + collect job per shard dir).
    */
  private def loadFiltersFp(spark: SparkSession,
      path: String): (String, Array[(Int, BloomFilter)]) = {
    val fs = fsFor(spark, path)
    val v1Wins = v1Authoritative(fs, path)
    val shards = if (v1Wins) Seq.empty else listShards(fs, path)
    if (shards.nonEmpty) {
      val withFp = shards.map { case (lo, cnt, dir) =>
        (lo, cnt, dir, fingerprint(fs, dir)) }
      val digest = withFp.map { case (_, _, dir, fp) =>
        dir.getName + fp.mkString("[", ",", "]") }.mkString(";")
      val loaded = scala.collection.mutable.Map
        .empty[String, Array[(Int, BloomFilter)]]
      val misses = withFp.filter { case (_, _, dir, fp) =>
        filterMemo.get((path, dir.getName)) match {
          case Some((cachedFp, filters)) if cachedFp == fp =>
            loaded(dir.getName) = filters; false
          case _ => true
        }
      }
      if (misses.nonEmpty) {
        val rows = spark.read.parquet(misses.map(_._3.toString): _*)
          .select("bucket", "bloom").collect()
          .map(r => r.getAs[Int]("bucket") -> BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom"))))
        misses.foreach { case (lo, cnt, dir, fp) =>
          val mine = rows.filter { case (b, _) => b >= lo && b < lo + cnt }
            .sortBy(_._1)
          filterMemo.put((path, dir.getName), (fp, mine))
          loaded(dir.getName) = mine
        }
      }
      (digest, shards.toArray.flatMap { case (_, _, dir) =>
        loaded(dir.getName) })
    }
    // a present-but-empty shard root is the LEGAL all-purged state
    // (every key deleted, every shard dropped): zero filters, every
    // probe a provable miss — not a missing index. Coexistence never
    // reaches here (v1Wins routed it to the v1 branch).
    else if (!v1Wins && fs.exists(shardRoot(path))) ("v2:empty", Array.empty)
    else {
      healV1(fs, path)
      require(fs.exists(hp(s"$path/_blooms")),
        s"no bloom sidecar at $path — write() first")
      val dir = hp(s"$path/_blooms")
      ("v1:" + fingerprint(fs, dir).mkString("[", ",", "]"),
        loadDir(spark, fs, path, dir))
    }
  }

  // ---- read paths ----

  /** Buckets whose bloom might contain `key` — a driver-side test over
    * the memoized filters (one row per bucket; KBs per filter at
    * fpp=0.01). Sorted for deterministic downstream path lists.
    */
  def candidateBuckets(spark: SparkSession, path: String,
      key: String): Seq[Int] =
    loadFilters(spark, path)
      .filter { case (_, f) => f.mightContainString(key) }
      .map(_._1).sorted.toSeq

  /** Bulk membership as a DataFrame — the backfill shape with NO
    * driver key loop: the memoized filters broadcast once, membership
    * tests run EXECUTOR-side over the keys, and the confirm read is
    * pruned to the union of candidate buckets (the only driver-sized
    * artifact is that bucket list). Null keys are never indexed
    * ([[BloomAgg]] skips them at build), so membership is vacuously
    * false — they are dropped here deliberately. Returns the DISTINCT
    * key strings present in the index, as a one-column ("k") frame —
    * exact: the bloom screen admits no false negatives and the
    * confirm join weeds its false positives.
    */
  def existingKeysDf(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame, keysCol: String): DataFrame = {
    val kd = keys.select(col(keysCol).cast("string").as("k"))
      .filter(col("k").isNotNull).distinct()
    val (fpDigest, filters) = loadFiltersFp(spark, path)
    val buckets = candidateBucketsFor(spark, filters, kd)
    val paths = existingBucketPaths(fsFor(spark, path), path, buckets,
      fpDigest)
    if (paths.isEmpty) return kd.filter(lit(false))
    val pruned = spark.read.option("basePath", s"$path/data")
      .parquet(paths: _*)
      .select(col(keyCol).cast("string").as("k"))
    maskTombstones(spark, path, pruned.join(kd, "k").distinct(), col("k"))
  }

  /** Which of `keys` already exist in the index — the batch-bounded
    * driver-Set form of [[existingKeysDf]] streaming ingest dedups
    * with. Null keys are dropped (never indexed — see existingKeysDf).
    */
  def existingKeys(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[String]): Set[String] = {
    val nn = keys.filter(_ != null)
    if (nn.isEmpty) return Set.empty
    import spark.implicits._
    existingKeysDf(spark, path, keyCol, nn.toDF("k"), "k")
      .collect().map(_.getString(0)).toSet
  }

  /** Exact point lookup: sidecar-pruned bucket dirs + the exact
    * residual filter. Reads ONLY candidate buckets — `df.inputFiles`
    * of the result is the pin. An all-buckets-rejected key costs the
    * (memoized) sidecar filters alone (the empty frame is planned
    * with a contradiction filter, which prunes every file at
    * planning). Both branches return the data schema WITHOUT the
    * internal fbib partition column.
    */
  def lookup(spark: SparkSession, path: String, keyCol: String,
      key: String): DataFrame =
    lookupKeys(spark, path, keyCol, Seq(key))

  /** Multi-key point lookup — the union of [[lookup]] results for a
    * set of DISTINCT keys, served by ONE pruned read instead of one
    * read (listing + footer + scan job) per key: candidate buckets are
    * the union over keys of the driver-side bloom tests, the data read
    * prunes to that union, and a single `isin` filter + tombstone mask
    * finishes. Exact for the same reason lookup is: every bucket
    * holding a key is a candidate (no false negatives), each row
    * matches at most one key, and false-positive buckets contribute
    * nothing past the filter.
    */
  def lookupMany(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty && keys.distinct == keys,
      s"keys must be non-empty and distinct: $keys")
    lookupKeys(spark, path, keyCol, keys)
  }

  private def lookupKeys(spark: SparkSession, path: String,
      keyCol: String, keys: Seq[String]): DataFrame = {
    val (fpDigest, filters) = loadFiltersFp(spark, path)
    val cands = filters
      .filter { case (_, f) => keys.exists(f.mightContainString) }
      .map(_._1).sorted.toSeq
    val paths = existingBucketPaths(fsFor(spark, path), path, cands,
      fpDigest)
    val base =
      if (paths.isEmpty)
        // the all-rejected fast path still needs the DATA SCHEMA for
        // its typed empty frame; an all-purged index has no files left
        // to infer it from — loud and specific beats Spark's generic
        // inference error
        try spark.read.parquet(s"$path/data").filter(lit(false))
        catch { case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalStateException(
            s"$path holds no data files (every key purged?) — a typed " +
              "empty result is unrepresentable; rebuild with write()", e)
        }
      else
        spark.read.option("basePath", s"$path/data").parquet(paths: _*)
    maskTombstones(spark, path,
      base.drop("fbib").filter(col(keyCol).cast("string").isin(keys: _*)),
      col(keyCol).cast("string"))
  }
}
