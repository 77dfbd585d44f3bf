package graft.sources

import java.util.OptionalLong
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import graft.grid._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 connector that pivots a chunked N-D grid into a lazy,
  * partition-pruned relational table — the Spark re-expression of the
  * reference's custom TableProvider (SURVEY §2A A1-A9; reference
  * src/lib.rs:161-917 + xarray_sql/reader.py:192-337).
  *
  * Architecture (scale-first):
  *   - one `InputPartition` per chunk block, carrying only slice offsets,
  *     per-dim bounds and an exact row count — O(metadata) planning, zero
  *     data reads before execution (the reference's 4-stage laziness
  *     invariant, tests/test_reader.py:254-305);
  *   - zone-map pruning of partitions happens at `planInputPartitions`
  *     using the filters Spark pushed down (all filters stay residual, so
  *     pruning only needs soundness — the analogue of DataFusion Inexact);
  *   - projection pushdown reaches storage: the partition reader reads
  *     only requested variables from the store (A8), and a COUNT(*)-style
  *     empty projection reads no variable data at all (A9/lib.rs:609-614);
  *   - `estimateStatistics` reports exact post-pruning row counts so
  *     Catalyst/AQE picks broadcast joins from real cardinalities.
  */
object GridSource {
  /** Driver-side registry: datasets are handed to the provider by key
    * because DSv2 options are strings. Partitions serialize the store
    * itself, so executors never consult the registry.
    */
  private val registry = new ConcurrentHashMap[String, (GridStore, Map[String, Int], Seq[String])]()

  def register(key: String, store: GridStore, chunks: Map[String, Int],
      groupDims: Seq[String]): Unit =
    registry.put(key, (store, chunks, groupDims))

  def lookup(key: String): (GridStore, Map[String, Int], Seq[String]) = {
    val v = registry.get(key)
    require(v != null, s"no grid dataset registered under key '$key'")
    v
  }

  val FORMAT = "graft.sources.GridTableProvider"
}

/** Test/ops instrumentation: exact partition-open and variable-read counts
  * (the Spark analogue of the reference's `_iteration_callback` hook,
  * reader.py:198-200; works in local mode where executors share the JVM).
  */
object ReadCounters {
  val partitionsOpened = new LongAdder
  private val varReads = new ConcurrentHashMap[String, LongAdder]()
  def recordVarRead(name: String): Unit =
    varReads.computeIfAbsent(name, _ => new LongAdder).increment()
  def varReadCount(name: String): Long =
    Option(varReads.get(name)).map(_.sum()).getOrElse(0L)
  def reset(): Unit = { partitionsOpened.reset(); varReads.clear() }
}

class GridTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (store, _, groupDims) = GridSource.lookup(options.get("dataset"))
    val groupVars = store.schema.vars.filter(_.dims == groupDims)
    store.schema.tableSchema(groupDims, groupVars)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val key = properties.get("dataset")
    val (store, chunks, groupDims) = GridSource.lookup(key)
    new GridTable(key, store, chunks, groupDims)
  }

  override def supportsExternalMetadata(): Boolean = false
}

class GridTable(key: String, store: GridStore, chunks: Map[String, Int],
    groupDims: Seq[String]) extends Table with SupportsRead {
  private val groupVars = store.schema.vars.filter(_.dims == groupDims)

  override def name(): String = s"grid:$key"
  override def schema(): StructType = store.schema.tableSchema(groupDims, groupVars)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(store, chunks, groupDims, groupVars, schema())
}

class GridScanBuilder(store: GridStore, chunks: Map[String, Int],
    groupDims: Seq[String], groupVars: Seq[VarDef], fullSchema: StructType)
  extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var countStarPushed = false

  /** All filters are kept as residual (Spark re-applies them row-level) —
    * the pushed copies only drive partition pruning, mirroring the
    * reference's Inexact pushdown (lib.rs:548-565).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Unfiltered COUNT(*) is answered entirely from chunk metadata —
    * exact row counts are products of chunk shapes (the reference's
    * metadata count, tests/test_stats.py:78-91). Only safe with no
    * residual filters; grouped or column aggregates are not pushed.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    pushed.isEmpty && agg.groupByExpressions().isEmpty &&
      agg.aggregateExpressions().length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar]

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (supportCompletePushDown(agg)) { countStarPushed = true; true }
    else false
  }

  override def build(): Scan =
    if (countStarPushed) new CountStarScan(store, chunks, groupDims)
    else new GridScan(store, chunks, groupDims, groupVars, required, pushed)
}

/** Complete COUNT(*) pushdown: one partition, one row, zero data access. */
class CountStarScan(store: GridStore, chunks: Map[String, Int],
    groupDims: Seq[String]) extends Scan with Batch {
  private val total: Long =
    ChunkGrid.groupBlocks(store.schema, groupDims, chunks)
      .map(ChunkGrid.rowCount).sum

  override def readSchema(): StructType =
    StructType(Seq(org.apache.spark.sql.types.StructField(
      "count(*)", org.apache.spark.sql.types.LongType, nullable = false)))
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(CountStarPartition(total))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private var emitted = false
          private val n = p.asInstanceOf[CountStarPartition].total
          override def next(): Boolean = { val r = !emitted; emitted = true; r }
          override def get(): InternalRow = {
            val row = new GenericInternalRow(1)
            row.setLong(0, n)
            row
          }
          override def close(): Unit = {}
        }
    }
  override def description(): String =
    s"GridCountStarScan rows=$total (metadata only)"
}

final case class CountStarPartition(total: Long) extends InputPartition

class GridScan(store: GridStore, chunks: Map[String, Int],
    groupDims: Seq[String], groupVars: Seq[VarDef],
    required: StructType, filters: Array[Filter])
  extends Scan with Batch with SupportsReportStatistics {

  /** Partition planning: enumerate chunk blocks, compute per-dim bounds
    * from coordinate arrays only (actual min/max, so descending axes work;
    * reference df.py:455-465), and drop blocks a pushed filter provably
    * excludes (A6). No variable data is touched here.
    */
  private lazy val survivingBlocks: Seq[(Seq[(Int, Int)], Map[String, DimBounds])] = {
    val allBlocks = ChunkGrid.groupBlocks(store.schema, groupDims, chunks)
    allBlocks
      .map(b => (b, blockBounds(b)))
      .filterNot { case (_, bounds) =>
        filters.exists(f => ZoneMapPruning.excludes(f, bounds))
      }
  }

  private def blockBounds(block: Seq[(Int, Int)]): Map[String, DimBounds] =
    groupDims.zip(block).flatMap { case (dimName, (start, len)) =>
      val coords = store.schema.dim(dimName).coords
      coords match {
        case DoubleCoords(v) =>
          val s = v.slice(start, start + len)
          if (s.isEmpty) None else Some(dimName -> NumBounds(s.min, s.max))
        case FloatCoords(v) =>
          val s = v.slice(start, start + len).map(_.toDouble)
          if (s.isEmpty) None else Some(dimName -> NumBounds(s.min, s.max))
        case IntCoords(v) =>
          val s = v.slice(start, start + len).map(_.toDouble)
          if (s.isEmpty) None else Some(dimName -> NumBounds(s.min, s.max))
        case LongCoords(v) =>
          val s = v.slice(start, start + len)
          if (s.isEmpty) None else Some(dimName -> LongBounds(s.min, s.max))
        case TimeCoords(v) =>
          val s = v.slice(start, start + len)
          if (s.isEmpty) None else Some(dimName -> LongBounds(s.min, s.max))
        case StringCoords(_) => None // strings: no pruning bounds
      }
    }.toMap

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    survivingBlocks.map { case (block, _) =>
      GridInputPartition(store, groupDims, block, required.fieldNames)
        : InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GridPartitionReaderFactory

  /** Exact statistics from chunk metadata (A9): row count = sum of block
    * products after pruning; bytes = rows x fixed width of the pruned
    * schema. Feeds Catalyst's broadcast-join selection.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = survivingBlocks.map(b => ChunkGrid.rowCount(b._1)).sum
    private val width = math.max(8,
      required.fieldNames.map(widthOf).sum)
    override def sizeInBytes(): OptionalLong = OptionalLong.of(rows * width)
    override def numRows(): OptionalLong = OptionalLong.of(rows)
  }

  private def widthOf(col: String): Int =
    groupVars.find(_.name == col).map(_.dtype.byteWidth)
      .orElse(groupDims.find(_ == col)
        .map(d => store.schema.dim(d).coords.gridType.byteWidth))
      .getOrElse(8)

  override def description(): String = {
    val total = ChunkGrid.groupBlocks(store.schema, groupDims, chunks).size
    s"GridScan dims=[${groupDims.mkString(",")}] " +
      s"partitions=${survivingBlocks.size}/$total cols=[${required.fieldNames.mkString(",")}]"
  }
}

/** One chunk block: slice offsets + the store handle. Bounds/row counts are
  * planning-time only and deliberately not shipped.
  */
final case class GridInputPartition(store: GridStore, groupDims: Seq[String],
    block: Seq[(Int, Int)], requiredCols: Array[String]) extends InputPartition

class GridPartitionReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GridPartitionReader(partition.asInstanceOf[GridInputPartition])
}

/** Streams the pivoted rows of one chunk block: strided coordinate
  * arithmetic over the block shape (flat row i -> per-dim index
  * (i / stride_k) % shape_k; reference df.py:241-250,331-336), with data
  * variables read once per partition — only the requested ones (A8), and
  * none at all for an empty projection (COUNT(*), A9).
  */
class GridPartitionReader(part: GridInputPartition)
  extends PartitionReader[InternalRow] {

  ReadCounters.partitionsOpened.increment()

  private val schema = part.store.schema
  private val shape: Array[Int] = part.block.map(_._2).toArray
  private val starts: Array[Int] = part.block.map(_._1).toArray
  private val n: Long = shape.foldLeft(1L)(_ * _.toLong)

  // C-order strides over the block shape (last dim fastest)
  private val strides: Array[Long] = {
    val s = new Array[Long](shape.length)
    var acc = 1L
    var k = shape.length - 1
    while (k >= 0) { s(k) = acc; acc *= shape(k); k -= 1 }
    s
  }

  // per required column: either a dim (coord lookup) or a var (flat array)
  private sealed trait ColSrc
  private case class DimCol(dimIdx: Int, coords: CoordArray) extends ColSrc
  private case class VarCol(data: AnyRef) extends ColSrc

  private val cols: Array[ColSrc] = part.requiredCols.map { c =>
    val di = part.groupDims.indexOf(c)
    if (di >= 0) DimCol(di, schema.dim(c).coords)
    else {
      ReadCounters.recordVarRead(c)
      VarCol(part.store.readVar(c, part.block))
    }
  }

  private var i: Long = -1L
  private val dimIdx = new Array[Int](shape.length)

  override def next(): Boolean = { i += 1; i < n }

  override def get(): InternalRow = {
    var k = 0
    while (k < shape.length) {
      dimIdx(k) = ((i / strides(k)) % shape(k)).toInt
      k += 1
    }
    val row = new GenericInternalRow(cols.length)
    var c = 0
    while (c < cols.length) {
      cols(c) match {
        case DimCol(d, coords) =>
          row.update(c, coords.internal(starts(d) + dimIdx(d)))
        case VarCol(data) =>
          val flat = i.toInt // block row counts are bounded by chunk sizing
          data match {
            case a: Array[Double] => row.update(c, a(flat))
            case a: Array[Float] => row.update(c, a(flat))
            case a: Array[Int] => row.update(c, a(flat))
            case a: Array[Long] => row.update(c, a(flat))
          }
      }
      c += 1
    }
    row
  }

  override def close(): Unit = {}
}
