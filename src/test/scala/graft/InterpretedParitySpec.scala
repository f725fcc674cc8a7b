package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.functions._

/** The vector expressions have two execution paths: `doGenCode` (used in
  * whole-stage codegen) and `nullSafeEval` (interpreted — codegen
  * fallback, filter pushdown evaluation, constant folding). Both must
  * agree, including on the edge semantics: mismatched lengths use the
  * common prefix, null elements contribute zero, zero denominators yield
  * 0.0. The codegen path is covered by every query test; this spec pins
  * the interpreted path by calling eval() directly.
  */
class InterpretedParitySpec extends SparkSpec {

  private def farr(xs: Float*) = ArrayData.toArrayData(xs.toArray)

  private val a = BoundReference(0, ArrayType(FloatType), nullable = true)
  private val b = BoundReference(1, ArrayType(FloatType), nullable = true)

  private def row(x: Seq[Float], y: Seq[Float]): InternalRow =
    InternalRow(farr(x: _*), farr(y: _*))

  test("interpreted dot/cosine/jaccard/magnitude match hand computations") {
    val r = row(Seq(3f, 6f, 9f), Seq(3f, 6f, 9f))
    assert(DotProduct(a, b).eval(r) === 126.0)
    assert(math.abs(CosineSimilarity(a, b).eval(r).asInstanceOf[Double] - 1.0) < 1e-12)
    assert(VectorMagnitude(a).eval(r).asInstanceOf[Double] === math.sqrt(126.0))
    val rj = row(Seq(1f, 1f, 1f, 0f), Seq(1f, 1f, 0f, 1f))
    assert(WeightedJaccard(a, b).eval(rj) === 0.5)
  }

  test("interpreted MinhashSignature matches hand computation and nulls on empty") {
    val pairsType = ArrayType(new StructType()
      .add("h1", LongType).add("h2", LongType))
    val pref = BoundReference(0, pairsType, nullable = true)
    def prow(ps: (Long, Long)*): InternalRow =
      InternalRow(ArrayData.toArrayData(
        ps.map { case (x, y) => InternalRow(x, y) }.toArray))
    val prime = 2147483647L
    val ps = Seq((5L, 11L), (100L, 3L), (7L, 90001L))
    val got = MinhashSignature(pref, 4).eval(prow(ps: _*))
      .asInstanceOf[ArrayData].toLongArray.toSeq
    val want = (0 until 4).map(j => ps.map { case (h1, h2) => (h1 + j * h2) % prime }.min)
    assert(got === want)
    assert(MinhashSignature(pref, 4).eval(prow()) === null)
  }

  test("interpreted SignBandSignatures matches per-plane dot signs") {
    val planes = Similarity2x2.tensor
    val r = row(Seq(1f, -2f, 0.5f, 3f), Seq(0f, 0f, 0f, 0f))
    val got = SignBandSignatures(a, planes).eval(r)
      .asInstanceOf[ArrayData].toLongArray.toSeq
    val want = planes.toSeq.map { band =>
      band.zipWithIndex.foldLeft(0L) { case (sig, (pl, p)) =>
        val dot = pl.zip(Seq(1.0, -2.0, 0.5, 3.0)).map { case (u, v) => u * v }.sum
        if (dot > 0) sig | (1L << p) else sig
      }
    }
    assert(got === want)
    // Zero vector: every dot is 0, no sign bit set — total, not null.
    val gz = SignBandSignatures(b, planes).eval(r)
      .asInstanceOf[ArrayData].toLongArray.toSeq
    assert(gz === Seq(0L, 0L))
  }

  private object Similarity2x2 {
    // 2 bands x 3 planes x 4 dims of fixed values covering both signs.
    val tensor: Array[Array[Array[Double]]] = Array(
      Array(Array(0.5, 0.5, -1.0, 0.25), Array(-1.0, 0.1, 0.1, 0.1),
        Array(0.0, 1.0, -1.0, 0.0)),
      Array(Array(1.0, 1.0, 1.0, 1.0), Array(-0.2, -0.2, 0.3, -0.4),
        Array(0.9, -0.1, 0.0, -0.3)))
  }

  test("interpreted CentroidArgmax picks max-cosine cell, first on ties") {
    val ids = Array(7, 3, 9)
    val cents = Array(
      Array(1f, 0f, 0f, 0f),   // cell 7
      Array(0f, 1f, 0f, 0f),   // cell 3
      Array(0f, 0f, 0f, 0f))   // cell 9: zero magnitude, scores 0
    def amax(vec: Seq[Float]) =
      CentroidArgmax(a, ids, cents).eval(row(vec, Seq(0f)))
    assert(amax(Seq(2f, 0.5f, 0f, 0f)) === 7)
    assert(amax(Seq(0.5f, 2f, 0f, 0f)) === 3)
    // Equidistant from cells 7 and 3 -> strict > keeps the FIRST (7),
    // matching array_position's first-maximum rule.
    assert(amax(Seq(1f, 1f, 0f, 0f)) === 7)
    // All-zero vector: every score 0, first centroid wins (old behavior).
    assert(amax(Seq(0f, 0f, 0f, 0f)) === 7)
    // Null vector -> null (callers coalesce to the first cell).
    assert(CentroidArgmax(a, ids, cents).eval(InternalRow(null, null)) === null)
  }

  test("interpreted zero-denominator guards return 0.0") {
    val rz = row(Seq(0f, 0f), Seq(1f, 2f))
    assert(CosineSimilarity(a, b).eval(rz) === 0.0)
    assert(WeightedJaccard(a, b).eval(row(Seq(0f, 0f), Seq(0f, 0f))) === 0.0)
  }

  test("interpreted mismatched lengths use the common prefix") {
    val r = row(Seq(1f, 2f, 3f, 4f), Seq(10f, 20f))
    assert(DotProduct(a, b).eval(r) === 50.0)
  }

  test("interpreted null input yields null; null literal element-free") {
    val r = InternalRow(farr(1f, 2f), null)
    assert(DotProduct(a, b).eval(r) === null)
    assert(CosineSimilarity(a, b).eval(r) === null)
  }

  test("interpreted equals codegen for random inputs") {
    val rng = new scala.util.Random(3)
    (0 until 50).foreach { _ =>
      val n = 1 + rng.nextInt(8)
      val x = Seq.fill(n)(rng.nextFloat() * 10 - 5)
      val y = Seq.fill(n)(rng.nextFloat() * 10 - 5)
      val r = row(x, y)
      // codegen reference: run through a one-row dataframe projection
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val df = Seq((x, y)).toDF("a", "b")
      val viaCodegen = df.select(
        graft.functions.vector.dot($"a", $"b"),
        graft.functions.vector.cosine($"a", $"b"),
        graft.functions.vector.jaccard($"a", $"b")).collect().head
      assert(math.abs(DotProduct(a, b).eval(r).asInstanceOf[Double]
        - viaCodegen.getDouble(0)) < 1e-12)
      assert(math.abs(CosineSimilarity(a, b).eval(r).asInstanceOf[Double]
        - viaCodegen.getDouble(1)) < 1e-12)
      assert(math.abs(WeightedJaccard(a, b).eval(r).asInstanceOf[Double]
        - viaCodegen.getDouble(2)) < 1e-12)
    }
  }

  test("interpreted SignPack packs strict-positive bits per 32-dim word") {
    // 40 dims: bits 0-31 land in word 0, bits 32-39 in word 1. Values at
    // exactly 0.0 (and nulls) must leave the bit CLEAR (> 0, not >= 0).
    val xs = (0 until 40).map {
      case 0  => 1f   // bit 0 set
      case 5  => -2f
      case 7  => 0f   // boundary: clear
      case 33 => 3f   // word 1, bit 1
      case _  => -1f
    }
    val got = SignPack(a, 32).eval(row(xs, Seq.empty))
      .asInstanceOf[ArrayData].toLongArray.toSeq
    assert(got === Seq(1L, 2L))
    assert(SignPack(a, 32).eval(InternalRow(null, null)) === null)
  }

  test("interpreted HammingWords is xor-popcount over the common prefix") {
    val wa = BoundReference(0, ArrayType(LongType), nullable = true)
    val wb = BoundReference(1, ArrayType(LongType), nullable = true)
    def wrow(x: Seq[Long], y: Seq[Long]): InternalRow =
      InternalRow(ArrayData.toArrayData(x.toArray),
        ArrayData.toArrayData(y.toArray))
    assert(HammingWords(wa, wb).eval(
      wrow(Seq(0xFFL, 0x1L), Seq(0x0FL, 0x3L))) === 5)
    // common prefix: extra words on one side are ignored
    assert(HammingWords(wa, wb).eval(
      wrow(Seq(0x1L), Seq(0x1L, 0xFFL))) === 0)
    assert(HammingWords(wa, wb).eval(InternalRow(null, null)) === null)
  }

  test("KgramHashes60 is bit-identical to the hash60 HOF chain it replaced") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // Real corpus text including multibyte (zh) documents: character-based
    // substring + UTF-8 hashing must agree with the expression chain the
    // DuckDB oracles replay.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq((9001L, "短文 本测试 中文字符 与 ascii mix"),
        (9002L, "exact"), (9003L, ""), (9004L, "abcdefgh"))
        .toDF("doc_id", "text"))
    val k = 8
    val legacy = when(length($"text") >= k,
      transform(sequence(lit(0), length($"text") - k),
        i => graft.ops.Dedup.hash60(0, $"text".substr(i + lit(1), lit(k)))))
      .otherwise(array().cast("array<long>"))
    val diff = docs
      .select($"doc_id", legacy.as("old"),
        graft.ops.TextAnalysis.kgramHashes($"text", k).as("neo"))
      .filter(not($"old" <=> $"neo"))
      .count()
    assert(diff === 0L, "fused kgram hashes drifted from the HOF form")
  }

  test("WinnowMins equals the array_distinct + array_min(slice) HOF form") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // Real corpus hash arrays plus edge shapes: shorter-than-window,
    // exactly-window, all-equal (dedups to one), and empty.
    val k = 8; val w = 4
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id",
        graft.ops.TextAnalysis.kgramHashes($"text", k).as("hs"))
      .unionByName(Seq(
        (9001L, Seq(5L, 3L, 9L)),                    // n < w -> empty
        (9002L, Seq(4L, 4L, 4L, 4L)),                // n == w, all equal
        (9003L, Seq.empty[Long]),
        (9004L, Seq(9L, 1L, 9L, 9L, 9L, 9L, 9L, 2L)) // min changes mid-run
      ).toDF("doc_id", "hs"))
    val legacy = when(size($"hs") >= w,
      array_distinct(transform(sequence(lit(0), size($"hs") - w),
        j => array_min(slice($"hs", j + lit(1), lit(w))))))
      .otherwise(array().cast("array<long>"))
    // Exact equality, order included: first-occurrence dedup order is
    // part of the contract both forms share.
    val diff = docs
      .select($"doc_id", legacy.as("old"),
        graft.ops.TextAnalysis.winnow($"hs", w).as("neo"))
      .filter(not($"old" <=> $"neo"))
      .count()
    assert(diff === 0L, "fused winnow drifted from the HOF form")
  }

  test("CharGramPairs48 equals the charShingles + hashPair48 HOF form") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq((9001L, "短文本 with 中文 grams"), (9002L, "abc"),
        (9003L, ""), (9004L, "aaaaaaaa")).toDF("doc_id", "text"))
    val n = 5
    val legacy = transform(graft.ops.Dedup.charShingles($"text", n),
      s => graft.ops.Dedup.hashPair48(s))
    // Compare as SETS: array_distinct order (first occurrence) and the
    // fused expression's insertion order coincide, but the contract the
    // consumers rely on is set equality.
    val diff = docs
      .select($"doc_id",
        array_sort(legacy).as("old"),
        array_sort(graft.functions.CharGramPairs48($"text", n)).as("neo"))
      .filter(not($"old" <=> $"neo"))
      .count()
    assert(diff === 0L, "fused char-gram pairs drifted from the HOF form")
  }

  test("WordGramPairs48 equals the tokens + wordShingles + hashPair48 HOF form") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .unionByName(Seq((9001L, "  double  spaces   collapse "),
        (9002L, "one two"), (9003L, ""), (9004L, "a b c a b c a b c"),
        (9005L, "短 文 本 три слова here")).toDF("doc_id", "text"))
    val n = 3
    val toks = graft.ops.Dedup.tokens($"text")
    val legacy = when(size(toks) >= n,
      transform(graft.ops.Dedup.wordShingles(toks, n),
        s => graft.ops.Dedup.hashPair48(s)))
      .otherwise(array().cast(graft.functions.CharGramPairs48.OutType))
    val diff = docs
      .select($"doc_id", array_sort(legacy).as("old"),
        array_sort(graft.functions.WordGramPairs48($"text", n)).as("neo"))
      .filter(not($"old" <=> $"neo"))
      .count()
    assert(diff === 0L, "fused word-gram pairs drifted from the HOF form")
  }
}
