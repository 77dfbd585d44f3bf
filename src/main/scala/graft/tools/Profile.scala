package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for bench hot spots: times labeled variants so
  * optimization targets are measured, not guessed. Not part of the
  * driver surface. Round-14 set: ngram_dup_spans stage isolation +
  * per-query planning-floor measurements.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.region(spark, d).count() // warm parquet path

    def t(label: String)(f: => Any): Unit = {
      val reps = 3
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-46s min=${times.min}%.3f  med=${times.sorted.apply(reps / 2)}%.3f")
    }

    val docs = Tables.documents(spark, d)

    // ---- ngram_dup_spans stage isolation ----
    val grams = docs.filter(length(col("text")) >= 30)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 29), i -> substring(text, i, 30))"))
        .as("gram"))

    t("ngram: full current query") {
      graft.queries.PipelineQueries.queries("ngram_dup_spans")(spark, d).count()
    }
    t("ngram: explode only (sum length)") {
      grams.agg(sum(length(col("gram")))).collect()
    }
    t("ngram: groupBy(gram).count codegen") {
      grams.groupBy("gram").agg(count(lit(1))).agg(count(lit(1))).collect()
    }
    t("ngram: groupBy(gram) capped agg only") {
      grams.groupBy("gram")
        .agg(graft.functions.CappedDistinctLongs
          .capped_distinct_longs(col("doc_id"), 8).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
        .agg(count(lit(1))).collect()
    }
    t("ngram: repartition+window+selfjoin variant") {
      val dp = grams.repartition(col("gram"))
        .groupBy("gram", "doc_id").agg(count(lit(1)).as("_k"))
        .select("gram", "doc_id")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
      val keep = dp.withColumn("df", count(lit(1)).over(w))
        .filter(col("df").between(2, 8))
        .select("gram", "doc_id")
      keep.as("a").join(keep.as("b"),
          col("a.gram") === col("b.gram") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 20)
        .count()
    }
    t("ngram: hashed grams (flag variant)") {
      graft.queries.PipelineQueries.ngramDupSpans(docs, hashedGrams = true).count()
    }

    // ---- planning/listing floor ----
    t("floor: read.parquet().count x10 (fresh)") {
      (1 to 10).foreach(_ => spark.read.parquet(s"$d/lineitem.parquet").count())
    }
    locally {
      val cached = spark.read.parquet(s"$d/lineitem.parquet")
      t("floor: same DataFrame .count x10 (memo)") {
        (1 to 10).foreach(_ => cached.count())
      }
    }
    t("floor: scan_limit full x10") {
      (1 to 10).foreach(_ =>
        graft.queries.RelationalQueries.queries("scan_limit")(spark, d).count())
    }

    // ---- iterative-loop job overhead ----
    t("bpe_train full (5 merges)") {
      graft.queries.PipelineQueries.queries("bpe_train")(spark, d).count()
    }
    t("perceptron_train full") {
      graft.queries.PipelineQueries.queries("perceptron_train")(spark, d).count()
    }
    t("perceptron_ovr_confusion full") {
      graft.queries.PipelineQueries.queries("perceptron_ovr_confusion")(spark, d).count()
    }
    t("colloc_lift full") {
      graft.queries.PipelineQueries.queries("colloc_lift")(spark, d).count()
    }
    t("bigram_commonness full") {
      graft.queries.PipelineQueries.queries("bigram_commonness")(spark, d).count()
    }
    t("events_retention full") {
      graft.queries.PipelineQueries.queries("events_retention")(spark, d).count()
    }
    t("token_encode full") {
      graft.queries.PipelineQueries.queries("token_encode")(spark, d).count()
    }
    spark.stop()
  }
}
