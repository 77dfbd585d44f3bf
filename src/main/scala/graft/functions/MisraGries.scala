package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary: at most `k` counters.
  * Weighted add: a decrement round subtracts `dec` from all k counters
  * AND from the incoming weight — k+1 units of mass destroyed per unit
  * of dec, so the total decrement over the whole stream is at most
  * n/(k+1): the classic undercount bound, generalized to weights
  * (which is what makes the summary mergeable).
  */
object MGSummary {
  /** Length-prefixed raw UTF-8 (never writeUTF — it throws past 64 KiB
    * keys); shared by the aggregate's shuffle serde and the streaming
    * keyed-state form (DocStreams.trendingTokens).
    */
  def toBytes(b: MGSummary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  /** The summary's items, sorted — the candidate set both the batch
    * aggregate's eval and the streaming state emission hand out.
    */
  def sortedKeys(b: MGSummary): Array[String] = {
    val keys = new Array[String](b.counts.size)
    b.counts.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    keys
  }

  def fromBytes(k: Int, bytes: Array[Byte]): MGSummary = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new MGSummary(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      b.counts.put(
        new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    b
  }
}

final class MGSummary(val k: Int) {
  val counts = new java.util.HashMap[String, java.lang.Long](k * 2)

  def add(s: String, w: Long): Unit = {
    val cur = counts.get(s)
    if (cur ne null) { counts.put(s, cur + w); return }
    if (counts.size < k) { counts.put(s, w); return }
    // decrement-all by the new item's weight, capped at the current
    // minimum so no counter goes negative; repeat until the weight is
    // absorbed or a slot frees. >= (not ==): a deserialized summary
    // can be LARGER than k (e.g. streaming state written with a
    // bigger k), and an == guard would never fire again, silently
    // unbounding the state — >= shrinks it back below k instead
    var remaining = w
    while (remaining > 0 && counts.size >= k) {
      var min = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) min = math.min(min, it0.next().longValue())
      val dec = math.min(min, remaining)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue.longValue() - dec
        if (nv == 0L) it.remove()
        else e.setValue(java.lang.Long.valueOf(nv))
      }
      remaining -= dec
    }
    if (remaining > 0) counts.put(s, remaining)
  }
}

/** Misra–Gries heavy-hitter CANDIDATES as a mergeable bounded-state
  * aggregate (Agarwal et al., "Mergeable Summaries", PODS 2012): state
  * is at most `k` (item, counter) pairs regardless of input size, and
  * merging two summaries then trimming back to `k` preserves the
  * classic guarantee — every item whose true frequency exceeds
  * n/(k+1) is present in the final summary, with its counter
  * undercounting by at most n/(k+1). The summary CONTENTS can vary
  * with partition/merge order (only the guarantee is deterministic),
  * so queries must treat the output as a candidate set and verify
  * exactly — the same contract as LSH candidates. `heavy_hitters`
  * does exactly that: candidates here, then one map-side-agg exact
  * count over the broadcast candidates, so the full vocabulary is
  * never shuffled.
  */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {

  require(k >= 1 && k <= (1 << 16), s"k out of range: $k")

  override def createAggregationBuffer(): MGSummary = new MGSummary(k)

  override def update(b: MGSummary, row: InternalRow): MGSummary = {
    val v = child.eval(row)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: MGSummary, o: MGSummary): MGSummary = {
    // add the other summary's weighted items; add() trims past k with
    // the min-capped decrement, which is exactly the merge-then-take-
    // (k+1)-th-largest reduction applied incrementally
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b.add(e.getKey, e.getValue)
    }
    b
  }

  override def eval(b: MGSummary): Any =
    // sorted for a stable display order; consumers treat it as a set
    new GenericArrayData(
      MGSummary.sortedKeys(b).map(UTF8String.fromString(_): Any))

  override def serialize(b: MGSummary): Array[Byte] = MGSummary.toBytes(b)

  override def deserialize(bytes: Array[Byte]): MGSummary =
    MGSummary.fromBytes(k, bytes)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : MisraGries = copy(child = newChild)
}

object MisraGries {
  /** Candidate heavy hitters: every item with true frequency
    * > n/(k+1) is guaranteed present; extras are possible — verify
    * exactly downstream.
    */
  def misra_gries(c: Column, k: Int): Column =
    ColumnInterop.toColumn(
      MisraGries(ColumnInterop.toExpr(c), k).toAggregateExpression())
}
