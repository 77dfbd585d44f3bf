package graft.plans

import graft.grid.{DoubleCoords, DurationCoords, FloatCoords, GridSchema, IntCoords, LongCoords, StringCoords, TimeCoords}
import graft.sources.{GridTable, SeparableDimFilters}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graftinterop.FilterInterop

/** DISTINCT over dimension columns answered from the store's
  * coordinate arrays — zero partitions opened (SURVEY §2A A9 extended;
  * the reference reuses its registered coord arrays for exactly this,
  * ds.py:477-505, falling back to per-dim SELECT DISTINCT only when
  * the plan is not a pure table scan, ds.py:530-543).
  *
  * `SELECT DISTINCT dim[, dim2] FROM grid [WHERE separable-dim-preds]`
  * plans as an Aggregate whose output IS its grouping set with no
  * aggregate functions, which the DSv2 aggregate pushdown cannot take
  * (it requires at least one AggregateFunc) — so a coordinate-spine
  * lookup (nearest-neighbor tables, reindex targets, stack ordinals)
  * pays a full O(cells) scan + Exchange to learn the O(dim) values
  * already sitting in [[GridSchema]]'s coord arrays. At 10¹² cells
  * that cost class is wrong even with projection pushdown reading
  * zero data-variable bytes.
  *
  * The rewrite: a dims-only DISTINCT over an unrestricted grid
  * relation, under at most attribute-projections and separable-exact
  * dimension filters, becomes a [[LocalRelation]] holding the cross
  * product of the projected dims' SURVIVING coordinates (the same
  * per-dim filter evaluation [[graft.sources.MetaAggScan]] uses).
  * Density makes this exact: every coordinate combination is realized
  * by at least one cell unless ANY dimension's surviving set is empty
  * (then the table has no rows and the DISTINCT is empty). Dimension
  * coordinates are unique by the grid contract (duplicate coords are
  * a reverse-pivot error in the reference, ds.py:800-805) — the same
  * assumption the MetaAggScan GROUP BY path already bakes in.
  *
  * Bails (keeping the normal scan) on: restricted tables
  * (`onlyBlocks`), non-attribute projections, untranslatable or
  * non-separable predicates (e.g. on a data variable), outputs that
  * are not all dimension columns, grouping sets that differ from the
  * output set, and spines over 2^20 rows (the MetaAggScan cap — exact
  * but driver-built).
  */
case class MetadataDistinctRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    // DISTINCT shape: every output expression is a bare attribute and
    // the grouping set equals the output set (a grouping key DROPPED
    // from the output would legally duplicate the remaining columns)
    val outs = agg.aggregateExpressions.flatMap {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    if (outs.isEmpty || outs.length != agg.aggregateExpressions.length)
      return None
    val groupIds = agg.groupingExpressions.flatMap {
      case a: AttributeReference => Some(a.exprId)
      case _ => None
    }
    if (groupIds.length != agg.groupingExpressions.length ||
      groupIds.toSet != outs.map(_.exprId).toSet) return None

    // walk down through attribute-only projections, collecting filters
    var conds = List.empty[Expression]
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        strip(c)
      case Filter(f, c) => conds ::= f; strip(c)
      case other => other
    }
    strip(agg.child) match {
      case rel: DataSourceV2Relation => rel.table match {
        case gt: GridTable if gt.onlyBlocks.isEmpty =>
          val schema = gt.store.schema
          val names = outs.map(_.name)
          if (!names.forall(gt.groupDims.contains)) return None
          // a repeated output column (select("lat", "lat").distinct())
          // would turn the cross product below into size^2 rows — the
          // duplicate column carries the SAME value per row, not an
          // independent axis. Rare shape; keep the scan.
          if (names.distinct.length != names.length) return None
          val translated = conds.map(FilterInterop.translate)
          if (translated.exists(_.isEmpty)) return None
          val fs = translated.flatten
          if (!fs.forall(f =>
            SeparableDimFilters.isSeparable(f, schema, gt.groupDims)))
            return None
          // surviving coords per dim — ALL dims, not just projected
          // ones: a filter emptying any dim empties the whole table
          val surviving = gt.groupDims.map(d =>
            d -> SeparableDimFilters.survivingIndices(fs, schema,
              gt.groupDims, d, 0, schema.dim(d).size)).toMap
          if (surviving.values.exists(_.isEmpty))
            return Some(LocalRelation(outs))
          // capped fold, not a raw product: enough huge axes could
          // overflow a Long product past the cap and let the rule try
          // to materialize an astronomically large LocalRelation
          val rowCount = names.map(d => surviving(d).length.toLong)
            .foldLeft(1L)((acc, n) =>
              if (acc > (1L << 20)) acc else acc * n)
          if (rowCount > (1L << 20)) return None
          val rows: Seq[InternalRow] = names
            .map(d => surviving(d).toSeq)
            .foldLeft(Seq(Seq.empty[Int]))((acc, idxs) =>
              acc.flatMap(prefix => idxs.map(prefix :+ _)))
            .map { combo =>
              new GenericInternalRow(names.zip(combo).map { case (d, i) =>
                coordInternal(schema, d, i)
              }.toArray): InternalRow
            }
          Some(LocalRelation(outs, rows))
        case _ => None
      }
      case _ => None
    }
  }

  /** Spark-internal representation of coordinate i of `dim`
    * (UTF8String for string axes; time/duration micros already ARE the
    * internal long forms) — the MetaAggScan convention.
    */
  private def coordInternal(schema: GridSchema, dim: String, i: Int): Any =
    schema.dim(dim).coords match {
      case DoubleCoords(v) => v(i)
      case FloatCoords(v) => v(i)
      case IntCoords(v) => v(i)
      case LongCoords(v) => v(i)
      case TimeCoords(v) => v(i)
      case DurationCoords(v) => v(i)
      case StringCoords(v) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(v(i))
    }
}
