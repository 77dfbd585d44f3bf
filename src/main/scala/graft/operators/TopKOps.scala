package graft.operators

import graft.plans.{GroupedTopKNode, GroupedTopKStrategy}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder}
import org.apache.spark.sql.graftinterop.PlanInterop

/** User-facing entry for the grouped top-k physical operator
  * (graft.plans.GroupedTopK): k first rows per group under the given
  * sort columns — heap-bounded partials, never a full window sort.
  * Include a unique tiebreak in `orderBy` for a deterministic result.
  *
  * Orders are (columnName, ascending) pairs built straight into
  * catalyst SortOrder — the Column-API `.desc` wraps the internal
  * (non-serializable) column-node order and must not reach a plan.
  */
object TopKOps {

  /** e.g. topKPerGroup(docs, Seq("lang"),
    *        Seq("n_chars" -> false, "doc_id" -> true), 3)
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    // ClusteredDistribution requires non-empty clustering; a global
    // top-k is just orderBy(...).limit(k) (TakeOrdered) — reject here
    // with a usable message instead of crashing in EnsureRequirements
    require(groupCols.nonEmpty,
      "groupCols must be non-empty — for a global top-k use orderBy().limit(k)")
    val spark = df.sparkSession
    // register the planner strategy once per session (idempotent; also
    // installable via spark.sql.extensions=graft.GraftExtensions)
    if (!spark.experimental.extraStrategies.contains(GroupedTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GroupedTopKStrategy
    val child = PlanInterop.analyzed(df)
    def attr(name: String): Attribute =
      child.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name)}"))
    val order = orderBy.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    PlanInterop.ofRows(spark,
      GroupedTopKNode(groupCols.map(attr), order, k, child))
  }
}
