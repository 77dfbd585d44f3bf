package graft.streaming

import graft.grid._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming ingest INTO the on-disk grid store: the live-archive shape
  * (a reanalysis feed emits the next hours; a sensor network emits the
  * next scan) built from pieces the engine already has — each
  * micro-batch of rows reverse-pivots onto the template grid
  * ([[graft.grid.GridResult.toGridWithTemplate]]) and lands as NEW
  * chunk files past the existing extent
  * ([[graft.grid.BinaryGridStore.appendAlong]]); old chunks are never
  * touched and queries opened after a batch see one seamless grid.
  *
  * Scale/size contract: a micro-batch must carry COMPLETE slabs along
  * `along` (every (non-along) cell present — the reverse pivot errors
  * on duplicates and fills gaps with NaN, which chunk stats then
  * refuse), and batch volume is a few chunks, so the driver-side
  * scatter is bounded by chunk size — the same envelope as the
  * driver-side `BinaryGridStore.write`. Bigger backfills go through
  * the distributed [[graft.grid.GridWriter]] instead; this sink is for
  * the steady drip at the head of the archive.
  */
object GridStreams {

  /** A foreachBatch writer appending each micro-batch to the store at
    * `root` along `along`. `dims` is the row-to-grid dimension order
    * (must match the store's); every other column is a data variable.
    * Call `.start()` (+ checkpointLocation for restart semantics).
    */
  def appendSink(rows: DataFrame, root: String, template: GridSchema,
      dims: Seq[String], along: String): DataStreamWriter[Row] =
    rows.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        appendBatch(batch, root, template, dims, along)
    }

  /** One batch: reverse-pivot rows onto (template non-along coords) x
    * (the batch's own `along` coordinates, ascending) and append.
    *
    * Replay-safe: foreachBatch is at-least-once, so `along` values the
    * store already carries are dropped before appending — a replayed
    * batch becomes a no-op instead of a duplicated slab, upgrading the
    * sink to effectively-once without any checkpoint coupling.
    */
  def appendBatch(batch: DataFrame, root: String, template: GridSchema,
      dims: Seq[String], along: String): Unit = {
    if (batch.isEmpty) return
    val have = coordValues(
      BinaryGridStore.open(root).schema.dim(along).coords).toSet
    val alongVals: IndexedSeq[Any] =
      batch.select(along).distinct().orderBy(along).collect()
        .map(_.get(0)).toIndexedSeq.filterNot(have)
    if (alongVals.isEmpty) return
    val fresh = batch.filter(batch.col(along).isin(alongVals: _*))
    val coords: Map[String, IndexedSeq[Any]] = dims.map { d =>
      d -> (if (d == along) alongVals
      else coordValues(template.dim(d).coords))
    }.toMap
    val res = GridResult.toGridWithTemplate(fresh, dims, coords)
    val slice = ArrayGridStore.fromResult(res, template)
    BinaryGridStore.appendAlong(root, slice, along)
    ()
  }

  /** Coordinate values in the external (Row) representation the reverse
    * pivot compares against.
    */
  private def coordValues(c: CoordArray): IndexedSeq[Any] = c match {
    case DoubleCoords(v) => v.toIndexedSeq
    case FloatCoords(v) => v.toIndexedSeq
    case IntCoords(v) => v.toIndexedSeq
    case LongCoords(v) => v.toIndexedSeq
    case TimeCoords(v) => v.map(DateTimeUtils.toJavaTimestamp).toIndexedSeq
    case DurationCoords(v) =>
      v.map(us => java.time.Duration.ofNanos(us * 1000L)).toIndexedSeq
    case StringCoords(v) => v.toIndexedSeq
  }
}
