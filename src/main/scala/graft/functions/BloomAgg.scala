package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom filter of a string column as a mergeable aggregate — the
  * build side of file-level bloom indexes ([[graft.sources.FileBloomIndex]]).
  *
  * Spark's own `DataFrameStatFunctions.bloomFilter` builds ONE filter
  * for a whole DataFrame via a driver-side job; this aggregate makes
  * the bloom a first-class `groupBy` citizen so one pass builds every
  * file/bucket's filter (map-side partials merge with `mergeInPlace` —
  * filters created with identical (expectedItems, fpp) are
  * bit-compatible). State is the fixed-size bit array regardless of
  * input rows; eval returns the serialized filter (binary), which
  * `BloomFilter.readFrom` reopens on the read side.
  *
  * The bloom law this preserves end-to-end: NO false negatives — an
  * inserted item tests true in the merged filter no matter how rows
  * were partitioned (pinned in FileBloomIndexSpec).
  */
case class BloomAgg(child: Expression, expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems >= 1 && expectedItems <= (1L << 32),
    s"expectedItems out of range: $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"fpp out of range: $fpp")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(b: BloomFilter, row: InternalRow): BloomFilter = {
    val v = child.eval(row)
    // putBinary over the raw UTF-8 bytes == putString (which decodes
    // to String only to re-encode the same bytes) — identical bits,
    // two fewer allocations per row on the corpus-wide build
    if (v != null) b.putBinary(v.asInstanceOf[UTF8String].getBytes)
    b
  }

  override def merge(b: BloomFilter, o: BloomFilter): BloomFilter = {
    b.mergeInPlace(o)
    b
  }

  override def eval(b: BloomFilter): Any = serialize(b)

  override def serialize(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression)
      : BloomAgg = copy(child = newChild)
}

object BloomAgg {
  /** Serialized bloom filter over the group's non-null string values. */
  def bloom_agg(c: Column, expectedItems: Long, fpp: Double): Column =
    ColumnInterop.toColumn(
      BloomAgg(ColumnInterop.toExpr(c), expectedItems, fpp)
        .toAggregateExpression())
}
