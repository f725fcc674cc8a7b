package graft

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, TextAnalysis}

/** k-center coreset selection and filter-funnel attribution. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- Similarity.kcenterSelect ----

  private def toyVecs = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f)),
    (3L, Array(0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")

  test("kcenterSelect walks the farthest-point trajectory") {
    // Seed = min id (1). Farthest from 1 is 4 (cosine distance 2), then 3
    // (distance 1 to both); 2 is nearly collinear with 1 and never picked.
    val sel = Similarity.kcenterSelect(toyVecs, "vec_id", "embedding", k = 3)
      .orderBy($"sel_rank").collect()
    assert(sel.map(_.getLong(1)).toSeq === Seq(1L, 4L, 3L))
    assert(sel.map(_.getDouble(2)).toSeq === Seq(2.0, 2.0, 1.0))
    // Radius = vector 2's tiny distance to center 1; separation is the
    // pairwise min among centers — the greedy invariant sep >= radius.
    val radius = sel.head.getDouble(3)
    assert(radius > 0 && radius < 0.01, s"radius=$radius")
  }

  test("kcenterSelect is partition-invariant") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.kcenterSelect(emb, "vec_id", "embedding", k = 5)
      .orderBy($"sel_rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    val b = Similarity.kcenterSelect(emb.repartition(7), "vec_id",
        "embedding", k = 5)
      .orderBy($"sel_rank").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(a.toSeq === b.toSeq)
  }

  test("kcenterSelect sel_d sequence is non-increasing") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val d = Similarity.kcenterSelect(emb, "vec_id", "embedding", k = 8)
      .orderBy($"sel_rank").collect().map(_.getDouble(2))
    assert(d.zip(d.tail).forall { case (x, y) => x >= y },
      s"sel_d must be non-increasing, got ${d.toSeq}")
  }

  // ---- TextAnalysis.gopherFirstFail ----

  test("gopherFirstFail attributes each doc to its first failing stage") {
    val good = ("the data and the model have results to show with care " +
      "and the word ").*(5).trim // 70 words, stopwords present
    val docs = Seq(
      (1L, "too short"), // fails word count
      (2L, Seq.fill(60)("extraordinarily").mkString(" ")), // mean len > 10
      (3L, Seq.fill(60)("ab#c#").mkString(" ")), // symbol ratio > 0.1
      (4L, Seq.fill(60)("- the bullet and that have of\n").mkString),// layout
      (5L, Seq.fill(60)("123 456").mkString(" ")), // alpha < 0.8
      (6L, Seq.fill(60)("word").mkString(" ")), // no required stopwords
      (7L, good)).toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        TextAnalysis.gopherFirstFail("text").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "words")
    assert(got(2L) === "word_shape")
    assert(got(3L) === "symbols")
    assert(got(4L) === "layout")
    assert(got(5L) === "alpha")
    assert(got(6L) === "stopwords")
    assert(got(7L) === "kept")
  }

  test("gopherFirstFail agrees with gopherQuality's keep decision") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val stages = docs.select($"doc_id",
      TextAnalysis.gopherFirstFail("text", minStopwords = 1).as("stage"))
    val keeps = TextAnalysis.gopherQuality(docs, "doc_id", "text")
    // Stock battery differs only in the stopword floor; re-derive keep at
    // floor 1 from the metric columns, exactly like p02 does.
    val keepAt1 = keeps.select($"doc_id",
      ($"n_words" >= 50 && $"n_words" <= 100000 &&
        $"mean_word_len" >= 3.0 && $"mean_word_len" <= 10.0 &&
        $"symbol_ratio" <= 0.1 && $"bullet_line_ratio" < 0.9 &&
        $"ellipsis_line_ratio" < 0.3 && $"alpha_word_ratio" >= 0.8 &&
        $"n_req_stopwords" >= 1).as("keep"))
    val joined = stages.join(keepAt1, "doc_id")
    val disagree = joined.filter(($"stage" === "kept") =!= $"keep").count()
    assert(disagree === 0)
  }
}
