package graft

import graft.functions.{CappedDistinctLongs, CfTimeExpr, DotProductF64, MinHashMd5, MisraGries, RollingFingerprint, SimHash64, WordSetFingerprint, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** `spark.sql.extensions`-style packaging of graft's native expressions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or: SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Registers SQL-callable forms of the custom Catalyst expressions; the
  * per-dataset `cftime` (bound to a calendar and units) is still
  * auto-registered by `XarrayContext.fromDataset` — the generic 3-arg
  * form here takes units/calendar as literals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit(e: Expression, what: String): String = e match {
    case Literal(v, _) if v != null => v.toString
    case Literal(null, _) => throw new IllegalArgumentException(
      s"argument '$what' must be a non-NULL literal (got NULL)")
    case other => throw new IllegalArgumentException(
      s"argument '$what' must be a literal constant (e.g. 5 or 'text'); " +
        s"got the expression ${other.sql} — column references and " +
        "computed values are not supported here")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // filtered COUNT(*) over a grid answered from chunk metadata when the
    // predicate region aligns with the chunk grid
    ext.injectOptimizerRule(graft.plans.MetadataCountRule)
    // global SUM(var) over a grid answered from per-chunk value sums,
    // scanning only predicate-boundary chunks
    ext.injectOptimizerRule(graft.plans.MetadataSumRule)
    // DISTINCT over dimension columns answered from the store's coord
    // arrays — coordinate spines stop paying an O(cells) scan
    ext.injectOptimizerRule(graft.plans.MetadataDistinctRule)
    // grouped top-k physical operator (heap-bounded partials; see
    // graft.plans.GroupedTopK — also self-registered by TopKOps)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
      (exprs: Seq[Expression]) => DotProductF64(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_md5"),
      new ExpressionInfo(classOf[MinHashMd5].getName, "minhash_md5"),
      (exprs: Seq[Expression]) =>
        MinHashMd5(exprs(0), lit(exprs(1), "k").toInt)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs(0), lit(exprs(1), "n").toInt)))
    ext.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (exprs: Seq[Expression]) => RollingFingerprint(exprs(0),
        lit(exprs(1), "k").toInt, lit(exprs(2), "w").toInt)))
    ext.injectFunction((
      FunctionIdentifier("word_set_fingerprint"),
      new ExpressionInfo(classOf[WordSetFingerprint].getName,
        "word_set_fingerprint"),
      (exprs: Seq[Expression]) => WordSetFingerprint(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    // aggregate: the analyzer wraps a raw AggregateFunction from the
    // registry in its AggregateExpression, same as the built-ins
    ext.injectFunction((
      FunctionIdentifier("capped_distinct_longs"),
      new ExpressionInfo(classOf[CappedDistinctLongs].getName,
        "capped_distinct_longs"),
      (exprs: Seq[Expression]) =>
        CappedDistinctLongs(exprs(0), lit(exprs(1), "cap").toInt)))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (exprs: Seq[Expression]) =>
        MisraGries(exprs(0), lit(exprs(1), "k").toInt)))
    ext.injectFunction((
      FunctionIdentifier("cftime"),
      new ExpressionInfo(classOf[CfTimeExpr].getName, "cftime"),
      (exprs: Seq[Expression]) => CfTimeExpr(exprs(0),
        lit(exprs(1), "units"), lit(exprs(2), "calendar"))))
  }
}
