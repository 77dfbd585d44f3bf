package graft.sources

import graft.functions.BloomAgg
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

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
  * deliberately uncorrelated with the key) + `path/_blooms` sidecar
  * (bucket, serialized filter), built with the mergeable [[BloomAgg]]
  * (map-side partials, fixed-size state).
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
  * consistent pair or a sidecar that over-approximates (extra
  * candidates are false POSITIVES — harmless; the batch rows simply
  * are not in the index yet and the caller retries). The sidecar
  * swap itself goes through `_blooms.next`/`_blooms.old` renames
  * with roll-forward/roll-back healing on the read side — no window
  * where the index is unreadable.
  */
object FileBloomIndex {

  /** Write `df` bucketed by `layout` with a per-bucket bloom over
    * `keyCol` (rendered as string). `expectedPerBucket` sizes every
    * filter identically — a requirement of partial-merge
    * compatibility, not a nicety. The blooms are aggregated from the
    * written files read back: bloom/data consistency by construction.
    */
  def write(df: DataFrame, keyCol: String, layout: org.apache.spark.sql.Column,
      path: String, expectedPerBucket: Long, fpp: Double = 0.01): Unit = {
    df.withColumn("fbib", layout)
      .repartition(col("fbib"))
      .write.partitionBy("fbib").mode("overwrite").parquet(s"$path/data")
    df.sparkSession.read.parquet(s"$path/data")
      .groupBy(col("fbib").cast("int").as("bucket"))
      .agg(BloomAgg.bloom_agg(col(keyCol).cast("string"),
        expectedPerBucket, fpp).as("bloom"))
      // filter params ride in the sidecar so appends can build
      // bit-compatible batch filters without out-of-band knowledge
      .withColumn("expected_items", lit(expectedPerBucket))
      .withColumn("fpp", lit(fpp))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_blooms")
  }

  /** Incremental ingest: MERGE the batch's blooms into the sidecar,
    * then append the batch into the existing bucket dirs (new part
    * files only — untouched bucket files stay byte-identical, pinned
    * in FileBloomIndexSpec). Only the new batch is scanned; the merge
    * is the bitwise OR of bit-compatible filters, so the merged
    * sidecar is byte-identical to a one-shot rebuild over the union
    * (bloom bits are a deterministic function of the item SET — also
    * pinned). Sidecar-first ordering is the crash discipline: a crash
    * before the data append leaves blooms that over-approximate
    * (false positives only — the no-false-negative law cannot break).
    * `layout` must be DETERMINISTIC here — it places the batch rows
    * and keys the batch blooms in two separate jobs. The sidecar is
    * rewritten whole — one metadata-sized parquet; at extreme file
    * counts shard it by bucket range (the stats-sidecar v2 lesson).
    */
  def append(batch: DataFrame, keyCol: String,
      layout: org.apache.spark.sql.Column, path: String): Unit = {
    val spark = batch.sparkSession
    val old = readSidecar(spark, path).collect()
    require(old.nonEmpty, s"no bloom sidecar at $path — write() first")
    val expected = old.head.getAs[Long]("expected_items")
    val fpp = old.head.getAs[Double]("fpp")
    val withB = batch.withColumn("fbib", layout)
    val fresh = withB
      .groupBy(col("fbib").cast("int").as("bucket"))
      .agg(BloomAgg.bloom_agg(col(keyCol).cast("string"),
        expected, fpp).as("bloom"))
      .collect().map(r =>
        r.getAs[Int]("bucket") -> r.getAs[Array[Byte]]("bloom")).toMap
    val merged = old.map { r =>
      val b = r.getAs[Int]("bucket")
      val bytes = fresh.get(b) match {
        case None => r.getAs[Array[Byte]]("bloom")
        case Some(nb) =>
          val f = BloomFilter.readFrom(new java.io.ByteArrayInputStream(
            r.getAs[Array[Byte]]("bloom")))
          f.mergeInPlace(BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(nb)))
          val bos = new java.io.ByteArrayOutputStream()
          f.writeTo(bos)
          bos.toByteArray
      }
      (b, bytes)
    } ++ fresh.filterNot { case (b, _) =>
      old.exists(_.getAs[Int]("bucket") == b) }
    import spark.implicits._
    merged.toSeq.toDF("bucket", "bloom")
      .withColumn("expected_items", lit(expected))
      .withColumn("fpp", lit(fpp))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_blooms.next")
    swapSidecar(spark, path)
    // data LAST: see the crash-discipline note above
    withB.repartition(col("fbib"))
      .write.partitionBy("fbib").mode("append").parquet(s"$path/data")
  }

  /** Compact the small-file debt appends accrue: rewrite ONLY buckets
    * holding more than `maxFilesPerBucket` part files (localCheckpoint
    * materializes them first — Spark rightly refuses to overwrite a
    * path it is still reading — then dynamic partition overwrite
    * replaces just the rewritten buckets). Content is preserved
    * row-for-row; untouched buckets and the sidecar stay byte-
    * identical (bloom bits are a function of the item set, which
    * compaction does not change) — all pinned in FileBloomIndexSpec.
    */
  def compact(spark: SparkSession, path: String,
      maxFilesPerBucket: Int = 1): Unit = {
    require(maxFilesPerBucket >= 1, s"maxFilesPerBucket=$maxFilesPerBucket")
    val fs = fsFor(spark, path)
    val dataRoot = new org.apache.hadoop.fs.Path(s"$path/data")
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

  private def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** cur -> `_blooms.old`, `_blooms.next` -> cur, drop old. Each step
    * is a metadata rename; [[healSidecar]] completes an interrupted
    * swap from either side.
    */
  private def swapSidecar(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val cur = new org.apache.hadoop.fs.Path(s"$path/_blooms")
    val next = new org.apache.hadoop.fs.Path(s"$path/_blooms.next")
    val oldP = new org.apache.hadoop.fs.Path(s"$path/_blooms.old")
    if (fs.exists(oldP)) fs.delete(oldP, true) // stale residue
    fs.rename(cur, oldP)
    fs.rename(next, cur)
    fs.delete(oldP, true)
  }

  /** Roll an interrupted swap forward (a fully-written `.next` is
    * always safe to adopt — it only over-approximates) or back.
    */
  private def healSidecar(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val cur = new org.apache.hadoop.fs.Path(s"$path/_blooms")
    if (fs.exists(cur)) return
    val next = new org.apache.hadoop.fs.Path(s"$path/_blooms.next")
    val oldP = new org.apache.hadoop.fs.Path(s"$path/_blooms.old")
    if (fs.exists(next)) { fs.rename(next, cur); fs.delete(oldP, true) }
    else if (fs.exists(oldP)) fs.rename(oldP, cur)
  }

  private def readSidecar(spark: SparkSession, path: String): DataFrame = {
    healSidecar(spark, path)
    spark.read.parquet(s"$path/_blooms")
  }

  /** Buckets whose bloom might contain `key` — a driver-side test over
    * the sidecar (one row per bucket; KBs per filter at fpp=0.01).
    * Sorted for deterministic downstream path lists.
    */
  def candidateBuckets(spark: SparkSession, path: String,
      key: String): Seq[Int] =
    readSidecar(spark, path).collect()
      .filter { r =>
        BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
          .mightContainString(key)
      }
      .map(_.getAs[Int]("bucket")).sorted.toSeq

  /** Which of `keys` already exist in the index — the batch-bounded
    * membership test streaming ingest dedups with: ONE sidecar read
    * tests every key against every bucket's bloom, then ONE
    * partition-pruned read over the union of candidate buckets,
    * filtered to the keys. Cost is sidecar bytes + candidate-bucket
    * bytes, never the index.
    */
  def existingKeys(spark: SparkSession, path: String, keyCol: String,
      keys: Seq[String]): Set[String] = {
    if (keys.isEmpty) return Set.empty
    val filters = readSidecar(spark, path).collect().map { r =>
      r.getAs[Int]("bucket") -> BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
    }
    val cands = filters
      .filter { case (_, f) => keys.exists(f.mightContainString) }
      .map(_._1).sorted
    if (cands.isEmpty) return Set.empty
    val pruned = spark.read.option("basePath", s"$path/data")
      .parquet(cands.map(b => s"$path/data/fbib=$b"): _*)
      .select(col(keyCol).cast("string").as("k"))
    // a literal isin stays planner-friendly for micro-batch key
    // counts; a bulk backfill joins instead of exploding the plan
    val matched =
      if (keys.size <= 1000) pruned.filter(col("k").isin(keys: _*))
      else {
        import spark.implicits._
        pruned.join(broadcast(keys.toDF("k")), "k")
      }
    matched.distinct().collect().map(_.getString(0)).toSet
  }

  /** Exact point lookup: sidecar-pruned bucket dirs + the exact
    * residual filter. Reads ONLY candidate buckets — `df.inputFiles`
    * of the result is the pin. An all-buckets-rejected key costs the
    * sidecar read alone (the empty frame is planned with a
    * contradiction filter, which prunes every file at planning).
    * Both branches return the data schema WITHOUT the internal fbib
    * partition column.
    */
  def lookup(spark: SparkSession, path: String, keyCol: String,
      key: String): DataFrame = {
    val cands = candidateBuckets(spark, path, key)
    val base =
      if (cands.isEmpty)
        spark.read.parquet(s"$path/data").filter(lit(false))
      else
        spark.read.option("basePath", s"$path/data")
          .parquet(cands.map(b => s"$path/data/fbib=$b"): _*)
    base.drop("fbib").filter(col(keyCol).cast("string") === key)
  }
}
