package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING retrieval against a stored IVF index — the serving shape
  * that closes the index lifecycle: build (`buildIvfIndex`) → ingest
  * (`appendToIvfIndex`) → maintain (`compactIvfIndex`) → serve a
  * CONTINUOUS probe stream, answers flowing to any streaming sink.
  */
object AnnStreams {

  /** Answer a stream of (pid, pv) probe vectors with each probe's
    * exact top-k over its `nprobe` nearest index cells.
    *
    * Scale shape: the codebook is collected once at plan time
    * (nCentroids rows — metadata-sized by construction) and broadcast
    * into a per-row cell-assignment function whose fold order matches
    * the batch paths' (`dot(pv,c)/|c|`, ties to the lowest cid), so a
    * streamed probe's answer is bit-identical to
    * [[graft.operators.SimilarityOps.annIvfFromIndexVector]] over the
    * same index. Candidates form through a STREAM-STATIC equi-join on
    * the assigned cell — stateless, re-planned per micro-batch against
    * the bucket-partitioned static scan — and per-probe top-k runs in
    * a heap-bounded flatMapGroupsWithState that keeps NO state at all:
    * a stream-static join never splits one probe's candidates across
    * micro-batches, so each group is complete when seen. No watermark
    * needed, Append output, state size zero.
    *
    * In: streaming (pid: long, pv: array<double>). Out: streaming
    * (pid, id, cosine), ≤ k rows per probe, no self-exclusion (the
    * probe is a request-time vector, not a stored row).
    */
  def probeStream(probes: DataFrame, indexDir: String, k: Int,
      nprobe: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    require(nprobe >= 1, s"nprobe=$nprobe")
    val spark = probes.sparkSession
    import spark.implicits._
    val cents: Array[(Int, Array[Double])] =
      try spark.read.parquet(s"$indexDir/_codebook")
        .select(col("id"), col("v")).collect()
        .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"$indexDir has no _codebook sidecar — the index predates " +
            "multi-probe support; rebuild it with buildIvfIndex", e)
      }
    require(cents.length >= nprobe,
      s"codebook has ${cents.length} centroids < nprobe=$nprobe")
    val bc = spark.sparkContext.broadcast(cents)
    // sequential fold — the same accumulation order as dot_f64 and the
    // driver-side codebookCells fold, so cell ranking is bit-identical
    val cellsOf = udf((v: Seq[Double]) => {
      val pv = v.toArray
      def d(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        s
      }
      bc.value.map { case (cid, cv) =>
        (cid, d(cv, pv) / math.sqrt(d(cv, cv)))
      }.sortBy { case (cid, s) => (-s, cid) }.take(nprobe).map(_._1)
    })
    val dot = GraftFunctions.dot_f64 _
    // tombstone-masked (deleted rows never surface as candidates);
    // note the mask is resolved at PLAN time like the static scan
    // itself — deletes landing mid-stream apply from the next (re)start
    val stored = graft.operators.SimilarityOps.liveIndex(spark, indexDir)
    val cand = probes
      .select(col("pid"), col("pv"))
      .withColumn("pn", sqrt(dot(col("pv"), col("pv"))))
      .withColumn("cid", explode(cellsOf(col("pv"))))
      .join(stored, col("bucket") === col("cid")) // stream-static
      .select(col("pid"), col("id"),
        (dot(col("v"), col("pv")) /
          (sqrt(dot(col("v"), col("v"))) * col("pn"))).as("cosine"))
    cand.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (pid: Long, rows: Iterator[(Long, Long, Double)],
         state: GroupState[Boolean]) => {
          // min-heap of the k best, worst on top; ties (cosine desc,
          // id asc) match every batch ANN path
          val worstFirst = Ordering.by[(Long, Long, Double), (Double, Long)](
            r => (r._3, -r._2)).reverse
          val heap = scala.collection.mutable.PriorityQueue
            .empty[(Long, Long, Double)](worstFirst)
          rows.foreach { r =>
            heap.enqueue(r)
            if (heap.size > k) heap.dequeue()
          }
          heap.dequeueAll.reverseIterator
            .map((r: (Long, Long, Double)) => (pid, r._2, r._3))
        })
      .toDF("pid", "id", "cosine")
  }
}
