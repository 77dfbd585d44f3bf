package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * All queries receive `(spark, sfDir)` and resolve tables through here so
  * scale factors stay interchangeable. `events.ts` is written as parquet
  * TIMESTAMP(NANOS), which Spark only reads via the `nanosAsLong` legacy
  * conf; we convert to microseconds to match DuckDB's read of the same file
  * (DuckDB truncates ns -> us).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events with `ts` as a proper TimestampType (microseconds, UTC).
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set at session construction in Verify/Bench/tools — a table loader
    * must not mutate session conf as a side effect).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .contains("true"),
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build " +
        "(events.parquet is TIMESTAMP(NANOS))")
    // integer `div`, not `/`: ns-since-epoch exceeds double's 2^53 mantissa
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
