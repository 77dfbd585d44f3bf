package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator: keep the k first rows per
  * group under a total order, WITHOUT sorting or shuffling the full
  * input the way the standard `row_number() OVER (PARTITION BY ...) <=
  * k` plan does.
  *
  * Physical shape (mirrors partial aggregation):
  *   - a PARTIAL exec runs bounded per-group heaps inside each input
  *     partition — at most k rows per (group, partition) survive;
  *   - the exchange Spark inserts for the FINAL exec's
  *     ClusteredDistribution therefore shuffles <= k * groups *
  *     partitions rows instead of n;
  *   - the FINAL exec merges with the same bounded heaps.
  *
  * At 100 TB with k=3 and thousands of groups this is the difference
  * between shuffling terabytes (window sort) and shuffling megabytes.
  * The order must be total (include a unique tiebreak column) for the
  * result — and the DuckDB oracle replay — to be deterministic.
  *
  * Memory envelope: each task holds (groups-in-partition x k) unsafe
  * rows and, unlike Spark's partial aggregation, has no sort-spill
  * fallback — at extreme group cardinality (groups x k rows no longer
  * fitting an executor's task memory) use the window plan instead.
  */
case class GroupedTopKNode(groupExprs: Seq[Expression],
    order: Seq[SortOrder], k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan)
      : LogicalPlan = copy(child = newChild)
}

/** Plans the logical node as final(exchange(partial(child))) — the
  * exchange materializes from the final exec's required distribution.
  */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(groups, order, k, child) =>
      GroupedTopKExec(groups, order, k, partial = false,
        GroupedTopKExec(groups, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class GroupedTopKExec(groupExprs: Seq[Expression],
    order: Seq[SortOrder], k: Int, partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def nodeName: String =
    if (partial) "GroupedTopKPartial" else "GroupedTopKFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val (groups, ord, limit) = (groupExprs, order, k)
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groups, schema)
      val toUnsafe = UnsafeProjection.create(schema, schema)
      val ordering = GenerateOrdering.generate(ord, schema)
      // per-group bounded heap; head = the WORST kept row, so a full
      // heap admits a new row iff it beats the head
      val worstFirst = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ordering.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.offer(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
      heaps.values.forEach { h => out ++=
        scala.jdk.CollectionConverters.IteratorHasAsScala(h.iterator()).asScala }
      out.iterator
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
      : SparkPlan = copy(child = newChild)
}
