package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterated byte-pair-encoding MERGE TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909) — the N-round loop `bpe_merge_pairs`' single
  * iteration belongs to. Each round counts adjacent SYMBOL pairs over
  * the vocabulary weighted by word frequency, merges the most frequent
  * pair everywhere (greedy left-to-right within a word, the BPE
  * contract), and repeats on the evolved vocabulary; the output is the
  * ordered merge table a tokenizer ships with.
  *
  * Scale shape (what makes 30k-50k merges tractable at 100 TB): the
  * corpus is scanned ONCE — the word-frequency aggregate — and every
  * round after that is vocabulary-sized (thousands-to-millions of
  * rows, not the corpus), with `localCheckpoint` truncating the loop
  * lineage (the [[GraphOps]] driver-loop idiom). The per-round winner
  * is ONE collected row.
  *
  * Determinism (hash-gate parity with DuckDB): counts are exact longs;
  * the winner is (cnt DESC, a, b) with binary-UTF8 string order on
  * both engines; the merge application is pure string surgery both
  * engines replay identically — double every separator, replace the
  * space-delimited pair pattern (doubling gives each adjacency its OWN
  * delimiters, so `replace`'s non-overlapping left-to-right scan
  * merges "a b a b" twice instead of losing the second pair to a
  * shared space — and left-to-right non-overlap IS the BPE greedy
  * order), then collapse runs of spaces. Merging never collides
  * distinct vocabulary entries: the symbol-string's concatenation is
  * the original word, which merges preserve.
  *
  * In: documents with `textCol`. Out: (step, a, b, cnt) — the merge
  * learned at each round, 1-based.
  */
object BpeTrain {

  def train(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainLoop(docs, textCol, nMerges)._1.toDF("step", "a", "b", "cnt")
  }

  /** Tokenizer APPLICATION — the other half a tokenizer ships: learn
    * `nMerges` merges, segment every word into the learned subwords
    * (the evolved vocabulary IS the segmentation — merges applied in
    * training order), and emit the corpus subword-frequency table's
    * top `topK`. Map-side after the loop: the final vocabulary
    * explodes its symbol strings weighted by word frequency — still
    * vocabulary-sized, never the corpus.
    */
  def subwordCounts(docs: DataFrame, textCol: String, nMerges: Int,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK=$topK")
    val vocab = trainLoop(docs, textCol, nMerges)._2
    vocab.select(explode(split(col("w"), " ")).as("token"), col("f"))
      .groupBy("token").agg(sum("f").as("n"))
      .orderBy(col("n").desc, col("token")).limit(topK)
  }

  private def trainLoop(docs: DataFrame, textCol: String, nMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(nMerges >= 1 && nMerges <= 1000, s"nMerges out of range: $nMerges")
    // one corpus scan: word frequencies; then words become
    // space-separated character-symbol strings
    var vocab = docs
      .select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .select(trim(regexp_replace(col("word"), "(.)", "$1 ")).as("w"),
        col("f"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to nMerges) {
      val withSy = vocab.select(col("f"), split(col("w"), " ").as("sy"))
      val top = withSy.filter(size(col("sy")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(sy) - 1), " +
            "i -> struct(sy[i-1] AS a, sy[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .collect()
      require(top.nonEmpty,
        s"vocabulary exhausted at merge $step of $nMerges — every word " +
          "is a single symbol")
      val (a, b, cnt) =
        (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((step, a, b, cnt))
      // literal pair values ride as lit() columns — never parsed, so
      // symbols containing quotes/regex metacharacters are inert
      val doubled =
        concat(lit(" "), replace(col("w"), lit(" "), lit("  ")), lit(" "))
      val applied = replace(doubled,
        lit(s" $a  $b "), lit(s" $a$b "))
      vocab = vocab
        .select(trim(regexp_replace(applied, " +", " ")).as("w"), col("f"))
        .localCheckpoint(true)
    }
    (merges.result(), vocab)
  }

  /** The DuckDB replay of [[train]] for a FIXED merge count: one CTE
    * chain per round (pairs → winner → applied vocabulary), the same
    * double-space merge surgery, winners unioned in step order. The
    * winner is recomputed relationally each round — nothing from the
    * engine's run is embedded, so the hash gate proves both engines
    * learn the same merges.
    */
  def oracleSql(nMerges: Int): String = {
    val init =
      """v0 AS (
        |  SELECT trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS w, f
        |  FROM (
        |    SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM (
        |      SELECT unnest(string_split(lower(text), ' ')) AS word
        |      FROM documents) t
        |    WHERE length(word) > 0 GROUP BY word) wf)""".stripMargin
    val rounds = (1 to nMerges).map { i =>
      val p = i - 1
      s"""p$i AS (
         |  SELECT sy[CAST(j AS INT)] AS a, sy[CAST(j AS INT) + 1] AS b, f
         |  FROM (SELECT string_split(w, ' ') AS sy, f FROM v$p) t,
         |       unnest(generate_series(1, len(sy) - 1)) AS g(j)
         |  WHERE len(sy) >= 2),
         |w$i AS (
         |  SELECT a, b, CAST(SUM(f) AS BIGINT) AS cnt FROM p$i
         |  GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1),
         |v$i AS (
         |  SELECT trim(regexp_replace(
         |    replace(' ' || replace(v.w, ' ', '  ') || ' ',
         |            ' ' || w$i.a || '  ' || w$i.b || ' ',
         |            ' ' || w$i.a || w$i.b || ' '),
         |    ' +', ' ', 'g')) AS w, v.f
         |  FROM v$p v, w$i)""".stripMargin
    }
    val out = (1 to nMerges)
      .map(i => s"SELECT CAST($i AS INTEGER) AS step, a, b, cnt FROM w$i")
      .mkString("\nUNION ALL\n")
    s"WITH $init,\n${rounds.mkString(",\n")}\n$out\nORDER BY step"
  }

  /** The [[subwordCounts]] replay: the same per-round CTE chain, then
    * the final vocabulary's symbols exploded and frequency-weighted.
    */
  def encodeOracleSql(nMerges: Int, topK: Int): String = {
    val base = oracleSql(nMerges)
    val cut = base.lastIndexOf("\nSELECT CAST(1 AS INTEGER) AS step")
    require(cut > 0, "oracle chain anchor missing")
    base.substring(0, cut) +
      s"""
         |SELECT token, CAST(SUM(f) AS BIGINT) AS n FROM (
         |  SELECT unnest(string_split(w, ' ')) AS token, f
         |  FROM v$nMerges) t
         |GROUP BY token ORDER BY n DESC, token LIMIT $topK""".stripMargin
  }
}
