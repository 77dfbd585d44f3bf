package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._

/** Aggregation buffer: at most `cap` distinct longs, or a sticky
  * overflow mark. cap is small by contract (posting-list ubiquity
  * thresholds, single digits), so membership is a linear scan over a
  * flat array — no hashing, no boxing, no allocation per row.
  */
final class CappedLongSet(val cap: Int) {
  val vals = new Array[Long](cap)
  var n = 0
  var over = false
  def add(v: Long): Unit = {
    if (over) return
    var i = 0
    while (i < n) { if (vals(i) == v) return; i += 1 }
    if (n == cap) over = true
    else { vals(n) = v; n += 1 }
  }
}

/** Distinct-set aggregate with BOUNDED state: collects the group's
  * distinct values while there are at most `cap` of them, and returns
  * NULL (not a truncated list) the moment a (cap+1)-th distinct value
  * appears. The one-shuffle replacement for the two-pass
  * "count-distinct then filter then collect" shape a posting-list
  * ubiquity filter otherwise needs — duplicate values collapse in the
  * map-side partial, and no aggregation state anywhere can exceed
  * cap+1 longs, even for a key present in every row of a 100 TB input
  * (where collect_set would hold a corpus-sized array in one task).
  *
  * Merge-exactness: if a group's true distinct count is <= cap, no
  * partial ever sees more than cap distinct values, so no buffer
  * overflows and the union reconstructs the exact set. If it exceeds
  * cap, the merge chain accumulates distinct values until some buffer
  * must pass cap — overflow is set there and is sticky through every
  * later merge, so the group evaluates to NULL. Truncation can
  * therefore never masquerade as a small set.
  *
  * Reference parallel: the xarray-sql-style engines run their dedup
  * ubiquity filters as two passes (/root/reference has no aggregate
  * pushdown surface at all); this is the Spark-native single-pass
  * form. (`ngram_dup_spans` used it through round 13; its round-14
  * shape counts df with a plain window instead — which buffers and
  * spills each gram's partition group rather than holding a bounded
  * buffer. This aggregate remains the SQL-exposed
  * `capped_distinct_longs` for extension users and the bounded-state
  * alternative where group state must stay O(cap).)
  *
  * Execution note: typed aggregates plan as ObjectHashAggregate, which
  * past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128) distinct keys per partition degrades to SORT-based
  * aggregation. For this aggregate that degradation is graceful — the
  * buffer is <= cap+1 longs, so the sorted stream carries no large
  * objects — and measured at sf0.1 (graft.NgramProbe, warm medians)
  * the threshold makes no material difference (6.1 s at 128 vs 6.8 s
  * at 1M for the full ngram_dup_spans), while a raised threshold
  * risks large boxed hash maps under AQE-coalesced partitions. Leave
  * the default alone.
  *
  * Measured trade vs the Tungsten alternative (NgramProbe, sf0.1 warm
  * medians): the 4-shuffle distinct + df-count + semi-join shape runs
  * ~4-4.7 s against this shape's ~5.5-6.6 s on local[32], because its
  * big aggregates stay in whole-stage codegen while ObjectHashAggregate
  * does not. It pays for that by shuffling the posting volume ~3 times
  * (distinct, df re-key, join re-key) against ONE here. Local mode is
  * CPU-bound so codegen wins; a 1000-executor cluster is network-bound
  * on these row counts, so shuffle volume decides and the single-pass
  * shape is the one shipped.
  */
case class CappedDistinctLongs(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongSet]
  with UnaryLike[Expression] {

  require(cap >= 1 && cap <= (1 << 20), s"cap out of range: $cap")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"capped_distinct_longs needs BIGINT input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): CappedLongSet = new CappedLongSet(cap)

  override def update(b: CappedLongSet, row: InternalRow): CappedLongSet = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedLongSet, o: CappedLongSet): CappedLongSet = {
    if (o.over) b.over = true
    else {
      var i = 0
      while (i < o.n && !b.over) { b.add(o.vals(i)); i += 1 }
    }
    b
  }

  override def eval(b: CappedLongSet): Any =
    if (b.over) null
    else {
      val a = java.util.Arrays.copyOf(b.vals, b.n)
      java.util.Arrays.sort(a)
      new GenericArrayData(a)
    }

  override def serialize(b: CappedLongSet): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * b.n)
    bb.put(if (b.over) 1.toByte else 0.toByte).putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.vals(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongSet = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new CappedLongSet(cap)
    b.over = bb.get() == 1
    val n = bb.getInt()
    var i = 0
    while (i < n) { b.vals(i) = bb.getLong(); i += 1 }
    b.n = n
    b
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_distinct_longs"

  override def withNewMutableAggBufferOffset(o: Int): CappedDistinctLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CappedDistinctLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : CappedDistinctLongs = copy(child = newChild)
}

object CappedDistinctLongs {
  /** NULL when the group holds more than `cap` distinct values, else
    * the sorted exact distinct array.
    */
  def capped_distinct_longs(c: Column, cap: Int): Column =
    ColumnInterop.toColumn(
      CappedDistinctLongs(ColumnInterop.toExpr(c), cap).toAggregateExpression())
}
