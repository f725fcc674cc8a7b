package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE trainer: merge sequence pinned on a hand-computed corpus, plus
  * partition-invariance (the determinism the driver's rows-only check on
  * t17 relies on) and the serving-side segmenter.
  *
  * Hand computation for "aaab"x3 + "aab"x2:
  *   round 1: (a,a) = 2*3 + 1*2 = 8  beats (a,b) = 5     -> merge "aa"
  *            aaab = [aa,a,b], aab = [aa,b]
  *   round 2: (aa,a) = 3, (a,b) = 3, (aa,b) = 2; tie breaks
  *            lexicographically: (a,b) < (aa,a)           -> merge "ab"
  *            aaab = [aa,ab], aab = [aa,b]
  *   round 3: (aa,ab) = 3 beats (aa,b) = 2               -> merge "aaab"
  *   round 4: (aa,b) = 2 meets minFreq                   -> merge "aab"
  *   round 5: no pairs left -> early stop.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "aaab aaab aab"),
    (2L, "aaab aab")).toDF("doc_id", "text")

  test("train reproduces the hand-computed merge sequence and early-stops") {
    val merges = Bpe.train(corpus, "text", numMerges = 8)
    assert(merges === Seq(
      (1, "a", "a", 8L),
      (2, "a", "b", 3L),
      (3, "aa", "ab", 3L),
      (4, "aa", "b", 2L)))
  }

  test("train is partition-invariant") {
    val a = Bpe.train(corpus.repartition(7), "text", numMerges = 3)
    val b = Bpe.train(corpus.coalesce(1), "text", numMerges = 3)
    assert(a === b)
  }

  test("segment applies merges leftmost-first, non-overlapping") {
    val words = Seq("aaab", "aab", "ab", "ba", "aaa").toDF("word")
    val out = Bpe.segment(words, "word", Seq(("a", "a"), ("a", "b")))
      .select(col("word"), col("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("aaab") === List("aa", "ab"))
    assert(out("aab") === List("aa", "b"))
    assert(out("ab") === List("ab"))
    assert(out("ba") === List("b", "a"))
    // (a,a) on "aaa" merges the LEFT pair: ["aa","a"], never ["a","aa"]
    assert(out("aaa") === List("aa", "a"))
  }

  test("trainTable exposes ranked merges as a DataFrame") {
    val df = Bpe.trainTable(spark, corpus, "text", numMerges = 2)
    assert(df.columns.toSeq === Seq("rank", "left", "right", "freq"))
    assert(df.orderBy(col("rank")).collect().map(_.getString(1)).toSeq ===
      Seq("a", "a"))
  }
}
