package graft.plans

import graft.grid.ChunkGrid
import graft.sources.{GridBounds, GridTable, ZoneMapPruning}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftinterop.FilterInterop

/** Filtered COUNT(*) from chunk metadata (SURVEY §2A A9 extended to the
  * filtered case; the reference only metadata-answers the unfiltered
  * count, tests/test_stats.py:78-91).
  *
  * DSv2 complete-aggregate pushdown cannot fire under a residual filter,
  * so `COUNT(*) WHERE dim BETWEEN ...` reads every surviving partition
  * just to count it. But when the predicate region is provably aligned
  * with the chunk grid — every partition is either fully excluded or
  * fully included by the dimension-only predicate — the answer is a sum
  * of block row counts, already known at planning time. This rule
  * rewrites such an Aggregate(Filter(grid)) to a LocalRelation with the
  * precomputed count: zero partitions opened. Any partition that
  * straddles the predicate boundary, any non-translatable predicate, or
  * any data-variable reference makes the rule bail to the normal scan.
  *
  * At 100 TB this is the difference between a pure-metadata answer and a
  * cluster-wide scan for the common "how many rows in this time range"
  * query when ranges align with chunking (as calendar-aligned chunks do).
  */
case class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if agg.groupingExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 =>
      (agg.aggregateExpressions.head match {
        case a @ Alias(ae: AggregateExpression, _) if isCountStar(ae) =>
          rewrite(agg, a)
        case _ => None
      }).getOrElse(agg)
  }

  private def isCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(l: Literal)) => l.value != null
      case _ => false
    })

  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(_, c) => stripProjects(c)
    case other => other
  }

  private def rewrite(agg: Aggregate, alias: Alias): Option[LogicalPlan] =
    stripProjects(agg.child) match {
      case Filter(cond, rest) =>
        stripProjects(rest) match {
          case rel: DataSourceV2Relation =>
            rel.table match {
              case gt: GridTable =>
                FilterInterop.translate(cond).flatMap { f =>
                  val schema = gt.store.schema
                  val blocks =
                    ChunkGrid.groupBlocks(schema, gt.groupDims, gt.chunks)
                  var total = 0L
                  var decidable = true
                  blocks.foreach { b =>
                    val bounds = GridBounds.forBlock(schema, gt.groupDims, b)
                    if (ZoneMapPruning.excludes(f, bounds)) ()
                    else if (ZoneMapPruning.includes(f, bounds))
                      total += ChunkGrid.rowCount(b)
                    else decidable = false // straddles the boundary: bail
                  }
                  if (decidable)
                    Some(LocalRelation(Seq(alias.toAttribute),
                      Seq(new GenericInternalRow(
                        Array[Any](total)): InternalRow)))
                  else None
                }
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
}
