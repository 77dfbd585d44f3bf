package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.immutable.ListMap

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory from SURVEY.md §2 (relational surface
  * delegated to the engine in the reference, demonstrated on Spark built-ins
  * here) plus the training-data-pipeline operators (dedup, similarity
  * search, text analysis, event analytics). `oracleSql` carries the ANSI
  * equivalent DuckDB runs on the same parquet for the hash-match gate.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap.empty[String, (SparkSession, String) => DataFrame] ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.GridQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap.empty[String, String] ++
      graft.queries.RelationalQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.GridQueries.oracleSql

  /** Pinned output schemas (Spark DDL) for queries WITHOUT an oracle.
    * Empty since round 10: approx_stats — the one former rows-only
    * entry — now ships a tolerance-banded oracle (each engine computes
    * its own sketches AND exact anchors and emits band booleans, so
    * the hash compare is engine-neutral) and is value-gated like every
    * other query. The mechanism stays for future sketch queries.
    */
  def pinnedSchemas: Map[String, String] = Map.empty
}
