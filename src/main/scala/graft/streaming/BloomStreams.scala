package graft.streaming

import graft.sources.FileBloomIndex
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming ingest into a [[graft.sources.FileBloomIndex]] — the
  * third member of the streaming-ingest trio (zarr append sink, IVF
  * index ingest, and now the bloom point-lookup index), so a
  * continuously-arriving corpus stays point-searchable without batch
  * rebuilds.
  *
  * Replay-safe: foreachBatch is at-least-once, so keys the index
  * already carries are dropped before appending (a replayed batch is
  * a no-op instead of duplicated rows), and a batch repeating a key
  * INTERNALLY keeps one arbitrary row — the dedup contract, as with
  * the IVF ingest sink. The membership test is batch-bounded
  * ([[FileBloomIndex.existingKeys]]: one sidecar read + one pruned
  * read of candidate buckets). The sidecar-first crash discipline of
  * [[FileBloomIndex.append]] composes with replay: a crash between
  * the sidecar swap and the data write leaves keys whose blooms
  * match but whose rows are absent — the exact membership check
  * correctly reports them missing, so the replayed batch re-appends
  * them (self-healing), while the bloom re-merge is a bitwise no-op.
  *
  * `layout` must be deterministic (the [[FileBloomIndex.append]]
  * requirement).
  */
object BloomStreams {

  def ingestSink(rows: DataFrame, keyCol: String, layout: Column,
      indexDir: String): DataStreamWriter[Row] =
    rows.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        ingestBatch(batch, keyCol, layout, indexDir)
    }

  /** One ingest micro-batch; see [[ingestSink]]. */
  def ingestBatch(batch: DataFrame, keyCol: String, layout: Column,
      indexDir: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.dropDuplicates(keyCol).localCheckpoint(true)
    val keys = b.select(col(keyCol).cast("string").as("k"))
      .collect().map(_.getString(0)).toSeq
    if (keys.isEmpty) return
    val existing = FileBloomIndex.existingKeys(
      spark, indexDir, keyCol, keys)
    val fresh =
      if (existing.isEmpty) b
      else b.filter(!col(keyCol).cast("string")
        .isin(existing.toSeq: _*))
    if (!fresh.isEmpty)
      FileBloomIndex.append(fresh, keyCol, layout, indexDir)
  }
}
