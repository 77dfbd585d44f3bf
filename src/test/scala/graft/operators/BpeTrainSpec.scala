package graft.operators

import graft.SparkTestBase

/** The BPE training loop's semantic pins: greedy left-to-right merge
  * order (the overlap case "a b a b" merges BOTH pairs; "l l l"
  * merges the FIRST two), frequency-weighted winner selection with
  * (cnt DESC, a, b) tie order, and multi-round evolution where later
  * rounds merge symbols EARLIER rounds created.
  */
class BpeTrainSpec extends SparkTestBase {

  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("greedy left-to-right: overlapping pairs merge non-overlapping") {
    // "abab" -> pairs (a,b) x2, (b,a) x1: winner (a,b) cnt 2; the word
    // becomes [ab, ab] (both pairs merged — the doubled-separator law)
    // and round 2 merges (ab, ab)
    val m = BpeTrain.train(docs("abab abab abab"), "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(m == Seq((1, "a", "b", 6L), (2, "ab", "ab", 3L)), m.toString)
  }

  test("same-symbol runs merge the leftmost pair first") {
    // "lll": pairs (l,l) x2 -> winner (l,l) cnt 2; greedy leaves
    // [ll, l], so round 2 sees exactly one (ll, l) adjacency
    val m = BpeTrain.train(docs("lll"), "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(m == Seq((1, "l", "l", 2L), (2, "ll", "l", 1L)), m.toString)
  }

  test("winners weight by word frequency, ties break (cnt desc, a, b)") {
    // "xy" appears 3 times, "yz" twice: (x,y) cnt 3 beats (y,z) cnt 2;
    // after merging, round 2's only pair is (y,z) cnt 2
    val m = BpeTrain.train(docs("xy xy yz", "xy yz"), "text", 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(m == Seq((1, "x", "y", 3L), (2, "y", "z", 2L)), m.toString)
    // exact tie on cnt: (a,b) sorts before (a,c) — binary string order
    val t = BpeTrain.train(docs("ab ac"), "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(t == Seq(("a", "b")), t.toString)
  }

  test("exhausted vocabulary fails loudly, not silently short") {
    val e = intercept[IllegalArgumentException](
      BpeTrain.train(docs("ab ab"), "text", 3).collect())
    assert(e.getMessage.contains("vocabulary exhausted at merge"))
  }

  test("subwordCounts: segmentation by the learned merges, weighted") {
    // after 1 merge (a,b) the word "abab" (f=3) segments [ab, ab]:
    // token "ab" carries 2 x 3 = 6
    val t1 = BpeTrain.subwordCounts(docs("abab abab abab"), "text", 1, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(t1 == Seq(("ab", 6L)), t1.toString)
    // mixed vocabulary: "xy" f=3 merges, "yz" f=2 stays split after 1
    val t2 = BpeTrain.subwordCounts(docs("xy xy yz", "xy yz"), "text", 1, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(t2 == Seq(("xy", 3L), ("y", 2L), ("z", 2L)), t2.toString)
  }

  test("oracle generator emits one CTE chain per round") {
    val sql = BpeTrain.oracleSql(3)
    for (i <- 1 to 3) {
      assert(sql.contains(s"w$i AS"), s"missing round $i winner CTE")
      assert(sql.contains(s"v$i AS"), s"missing round $i vocab CTE")
    }
    assert(!sql.contains("w4 AS"))
  }
}
