package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary training (Sennrich, Haddow &
  * Birch 2016, arXiv:1508.07909) — the tokenizer-construction step of an
  * LM data pipeline, run over the corpus the tokenizer will serve.
  *
  * Scale shape: the corpus is touched EXACTLY ONCE (one tokenize + count
  * shuffle producing the distinct-word frequency relation, Zipf-bounded —
  * ~10^5-10^6 rows however many TB of text feed it). Every merge round then
  * operates on that persisted vocabulary relation only: one keyed
  * pair-count aggregation over ~vocab rows, a driver pull of exactly ONE
  * row (the argmax pair), and a map-side re-segmentation fold. Driver
  * traffic is `numMerges` rows total; nothing corpus-proportional ever
  * leaves the executors. This is the textbook corpus-level BPE formulation
  * (word-frequency weighted pair counts), not the per-document variant.
  *
  * Determinism: ties on pair frequency break lexicographically by (left,
  * right), and the fold applies merges leftmost-first non-overlapping —
  * both partition- and engine-invariant, so the merge table is a pure
  * function of the corpus.
  */
object Bpe {

  /** Distinct-word frequency relation: (word, freq). The only
    * corpus-proportional pass of the whole trainer.
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    // explode_outer + null filter: the non-outer generator's inferred
    // size()>0 pre-filter would tokenize every document twice (t22's
    // inference trap) in the trainer's one corpus-proportional pass.
    docs.select(explode_outer(Dedup.tokens(col(textCol))).as("word"))
      .filter(col("word").isNotNull)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Split a word into single-character symbols. */
  private def charSymbols(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** Apply ONE merge (a, b) -> ab to a symbol array, leftmost-first and
    * non-overlapping: a fold that merges the current symbol into the
    * accumulator's tail when the tail is exactly `a` and the symbol is
    * `b`. Because the merged token `ab` is itself a new tail, chains
    * resolve exactly as sequential BPE does ("aaa" under (a,a) becomes
    * ["aa","a"], never ["a","aa"]).
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Adjacent-pair frequencies over a (syms, freq) vocabulary relation:
    * (left, right, freq-weighted count). One keyed aggregation over
    * vocab-bounded data.
    */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("left"),
          element_at(col("syms"), i + 2).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("n"))

  /** Train `numMerges` BPE merges over the corpus. Returns the merge table
    * (rank, left, right, freq) in application order; stops early when no
    * pair reaches `minFreq`.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2): Seq[(Int, String, String, Long)] = {
    var vocab = wordFreqs(docs, textCol)
      .select(charSymbols(col("word")).as("syms"), col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count() // materialize before the loop re-derives from it
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("left"), col("right")).limit(1)
        .collect()
      if (top.isEmpty || top(0).getAs[Long]("n") < minFreq) done = true
      else {
        val (a, b, n) = (top(0).getAs[String]("left"),
          top(0).getAs[String]("right"), top(0).getAs[Long]("n"))
        merges += ((rank, a, b, n))
        val next = vocab
          .select(applyMerge(col("syms"), a, b).as("syms"), col("freq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count() // cut the round's lineage before dropping the parent
        vocab.unpersist()
        vocab = next
        rank += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Memoized [[train]]: the merge table is a pure function of (corpus
    * plan, numMerges, minFreq), and both the vocabulary query (t17) and
    * the fertility evaluation (t23) consume it — so the iterative
    * driver loop runs once per (session, corpus, params). Weak-keyed on
    * the session like [[graft.queries.Tables]].
    */
  def trainCached(docs: DataFrame, textCol: String, numMerges: Int,
      minFreq: Long = 2): Seq[(Int, String, String, Long)] = {
    val perSession = mergeCache.computeIfAbsent(docs.sparkSession,
      _ => new java.util.concurrent.ConcurrentHashMap[String,
        Seq[(Int, String, String, Long)]]())
    val key = s"${docs.queryExecution.logical.semanticHash()}/$textCol/" +
      s"$numMerges/$minFreq"
    perSession.computeIfAbsent(key, _ =>
      train(docs, textCol, numMerges, minFreq))
  }

  private val mergeCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String,
        Seq[(Int, String, String, Long)]]]())

  /** The trained merge table as a DataFrame (rank, left, right, freq). */
  def trainTable(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, minFreq: Long = 2): DataFrame = {
    import spark.implicits._
    trainCached(docs, textCol, numMerges, minFreq)
      .toDF("rank", "left", "right", "freq")
  }

  /** Segment words with an already-trained merge list: the serving-side
    * encode, a map-only fold per merge in rank order (no shuffles — the
    * merge list rides the plan as literals, like any trained-model
    * broadcast).
    */
  def segment(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame =
    words.withColumn("pieces",
      merges.foldLeft(charSymbols(col(wordCol))) {
        case (syms, (a, b)) => applyMerge(syms, a, b)
      })
}
