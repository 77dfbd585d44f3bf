package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure ngram_dup_spans shapes at sf0.1 (not a spec; run with
  * Test/runMain graft.NgramProbe [sfDir]).
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(length(col("text")) >= 30)
    def grams = docs.select(col("doc_id"), explode(expr(
      "transform(sequence(1, length(text) - 29), i -> substring(text, i, 30))"))
      .as("gram"))

    def cappedShape(): DataFrame =
      grams.groupBy("gram")
        .agg(graft.functions.CappedDistinctLongs
          .capped_distinct_longs(col("doc_id"), 8).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
        .select(explode(expr(
          "flatten(transform(ids, (x, i) -> transform(" +
            "slice(ids, i + 2, size(ids)), y -> struct(x, y))))")).as("p"))
        .groupBy(col("p.x").as("a_id"), col("p.y").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 20)

    def joinShape(): DataFrame = {
      val dg = grams.distinct()
      val freq = dg.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 8).select("gram")
      dg.join(freq, "gram")
        .groupBy("gram")
        .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
        .select(explode(expr(
          "flatten(transform(ids, (x, i) -> transform(" +
            "slice(ids, i + 2, size(ids)), y -> struct(x, y))))")).as("p"))
        .groupBy(col("p.x").as("a_id"), col("p.y").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 20)
    }

    def time(tag: String)(f: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"$tag%-30s median ${ts.map(_._1).sorted.apply(1)}%6.2f s  rows ${ts.head._2}")
    }

    def cappedDistinctShape(): DataFrame = {
      val dgrams = docs.select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, length(text) - 29), " +
          "i -> substring(text, i, 30)))")).as("gram"))
      dgrams.groupBy("gram")
        .agg(graft.functions.CappedDistinctLongs
          .capped_distinct_longs(col("doc_id"), 8).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
        .select(explode(expr(
          "flatten(transform(ids, (x, i) -> transform(" +
            "slice(ids, i + 2, size(ids)), y -> struct(x, y))))")).as("p"))
        .groupBy(col("p.x").as("a_id"), col("p.y").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 20)
    }

    // warm codegen/scan paths once so the first tag isn't penalized
    cappedShape().count(); joinShape().count(); cappedDistinctShape().count()
    time("capped")(cappedShape())
    time("capped + map-side distinct")(cappedDistinctShape())
    time("distinct+count+join")(joinShape())
    time("capped (2)")(cappedShape())
    time("capped + map-side distinct(2)")(cappedDistinctShape())
    time("distinct+count+join (2)")(joinShape())
    spark.stop()
  }
}
