package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for bench hot spots: times labeled variants so
  * optimization targets are measured, not guessed. Not part of the
  * driver surface.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.region(spark, d).count() // warm parquet path

    def t(label: String)(f: => Any): Unit = {
      val reps = 3
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-42s min=${times.min}%.3f  med=${times.sorted.apply(reps / 2)}%.3f")
    }

    val docs = Tables.documents(spark, d)

    t("docs: scan only") {
      docs.agg(count(lit(1))).collect()
    }
    t("docs: lower+split") {
      docs.select(size(split(lower(col("text")), " ")).as("n"))
        .agg(sum("n")).collect()
    }
    t("docs: +distinct") {
      docs.select(size(array_distinct(split(lower(col("text")), " "))).as("n"))
        .agg(sum("n")).collect()
    }
    t("docs: +sort") {
      docs.select(size(array_sort(array_distinct(split(lower(col("text")), " ")))).as("n"))
        .agg(sum("n")).collect()
    }
    t("docs: +concat_ws") {
      docs.select(length(concat_ws(" ",
        array_sort(array_distinct(split(lower(col("text")), " "))))).as("n"))
        .agg(sum("n")).collect()
    }
    t("docs: +md5") {
      docs.select(md5(concat_ws(" ",
        array_sort(array_distinct(split(lower(col("text")), " "))))
        .cast("binary")).as("h"))
        .agg(count("h")).collect()
    }
    t("dedup_fingerprint full") {
      graft.queries.PipelineQueries.queries("dedup_fingerprint")(spark, d).count()
    }
    t("lsh_candidate_pairs full") {
      graft.queries.PipelineQueries.queries("lsh_candidate_pairs")(spark, d).count()
    }
    t("neardup_jaccard full") {
      graft.queries.PipelineQueries.queries("neardup_jaccard")(spark, d).count()
    }
    t("minhash_signature full") {
      graft.queries.PipelineQueries.queries("minhash_signature")(spark, d).count()
    }
    t("shingles only") {
      docs.select(size(graft.functions.WordShingles.word_shingles(
        split(lower(col("text")), " "), 3)).as("n")).agg(sum("n")).collect()
    }
    t("shingles+minhash") {
      docs.select(graft.functions.MinHashMd5.minhash_md5(
        graft.functions.WordShingles.word_shingles(
          split(lower(col("text")), " "), 3), 4).as("s"))
        .agg(count("s")).collect()
    }
    t("lsh pairs via groupBy buckets") {
      // alternative to the band self-join: collect each bucket's ids,
      // generate pairs inside the bucket (buckets are tiny), distinct
      val docs2 = Tables.documents(spark, d)
      val sh = docs2.select(col("doc_id"),
        graft.functions.MinHashMd5.minhash_md5(
          graft.functions.WordShingles.word_shingles(
            split(lower(col("text")), " "), 3), 4).as("sigs"))
      val bands = sh.select(col("doc_id"), explode(array(
        concat(element_at(col("sigs"), 1), element_at(col("sigs"), 2)),
        concat(element_at(col("sigs"), 3), element_at(col("sigs"), 4))))
        .as("key"))
      bands.groupBy("key").agg(collect_list("doc_id").as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          "flatten(transform(array_sort(ids), (a, i) -> " +
            "transform(slice(array_sort(ids), i + 2, size(ids)), " +
            "b -> struct(a as doc_a, b as doc_b))))")).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
        .count()
    }
    t("neardup_jaccard broadcast-cand") {
      import graft.queries.PipelineQueries
      val q = PipelineQueries.queries("lsh_candidate_pairs")(spark, d)
      val sh = Tables.documents(spark, d)
        .select(col("doc_id"), graft.functions.WordShingles.word_shingles(
          split(lower(col("text")), " "), 3).as("sh"))
      val withA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
        .join(broadcast(q), "doc_a")
      val withB = sh.select(col("doc_id").as("doc_b"), col("sh").as("sb"))
        .join(broadcast(withA), "doc_b")
      val inter = size(array_intersect(col("sa"), col("sb")))
      val jac = inter.cast("double") /
        (size(col("sa")) + size(col("sb")) - inter)
      withB.select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
        .filter(col("jaccard") >= 0.4).count()
    }
    t("join_expr_ts full") {
      graft.queries.RelationalQueries.queries("join_expr_ts")(spark, d).count()
    }
    t("join_expr_ts broadcast orders") {
      val li = Tables.lineitem(spark, d)
      li.join(broadcast(Tables.orders(spark, d)),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAY"))
        .groupBy(month(col("o_orderdate")).cast("long").as("order_month"))
        .agg(count(lit(1)).as("cnt")).count()
    }
    t("window_fn full") {
      graft.queries.RelationalQueries.queries("window_fn")(spark, d).count()
    }
    t("embed_neardup full") {
      graft.queries.PipelineQueries.queries("embed_neardup")(spark, d).count()
    }
    t("dedup_exact full") {
      graft.queries.PipelineQueries.queries("dedup_exact")(spark, d).count()
    }
    spark.stop()
  }
}
