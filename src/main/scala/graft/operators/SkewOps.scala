package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter group keys: classic two-phase salted
  * aggregation. Phase 1 spreads each key over `salts` sub-keys (so one
  * hot key's rows land on `salts` reducers instead of one); phase 2
  * merges the partials. Results are identical to a direct groupBy for
  * any algebraic aggregate — counts and decimal-exact sums here.
  *
  * AQE's skew-join handling covers joins; this covers aggregation skew,
  * which AQE does not rebalance.
  */
object SkewOps {

  /** count + exact decimal sum of `valCol` per `keyCol`, salted. */
  def saltedCountSum(df: DataFrame, keyCol: String, valCol: String,
      salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val partial = df
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col(valCol).cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .as("__sum"))
    partial
      .groupBy(col(keyCol))
      .agg(sum("__cnt").as("cnt"),
        sum("__sum").cast(org.apache.spark.sql.types.DecimalType(38, 6))
          .as(s"sum_$valCol"))
  }
}
