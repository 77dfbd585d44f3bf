package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries under the SAME
  * session configuration the driver's Bench uses (local[32], 32
  * shuffle partitions, GraftExtensions registered) — the before/after
  * plan evidence for plans/r14/. Usage:
  *
  *   runMain graft.tools.PlanDump <outDir> <tag> <query> [query ...]
  *
  * writes <outDir>/<query>_<tag>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query>...")
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val p = java.nio.file.Paths.get(outDir, s"${n}_$tag.txt")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt =
          if (sys.env.contains("SPARK_GRAFT_PLAN_EXEC")) {
            // final adaptive plan: collect() executes THIS DataFrame's
            // own QueryExecution (count()/noop-write build a separate
            // one), so the subsequent explain shows AQE's re-optimized
            // stages (reused exchanges, runtime join changes). Only
            // use on queries with small results.
            df.collect()
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } else df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(p, txt)
        println(s"[plandump] wrote $p")
      } catch { case e: Throwable =>
        java.nio.file.Files.writeString(p, s"explain failed: $e\n")
        System.err.println(s"[plandump] $n failed: $e")
      }
    }
    spark.stop()
  }
}
