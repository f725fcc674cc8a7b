package graft.functions

import org.apache.spark.sql.{Column, GraftSqlInternal, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level API over the Catalyst vector expressions.
  *
  * Mirrors the reference's oracle-visible record surface
  * (node/wrapper/record.go): dot / dotRange / dotSub, magnitude,
  * cosine / cosineSub / cosineRange, jaccard / jaccardRange, get, meta.
  * Range variants compose `slice()` with the base expression, exactly as the
  * reference loops over `[start, end)` of both vectors
  * (record.go:79-127, 150-168).
  *
  * `start`/`end` are 0-based and half-open like the reference; `slice` is
  * 1-based, hence the `+ 1`.
  */
object vector {

  private def wrap2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                        org.apache.spark.sql.catalyst.expressions.Expression) =>
                       org.apache.spark.sql.catalyst.expressions.Expression)(
      a: Column, b: Column): Column =
    GraftSqlInternal.column(
      f(GraftSqlInternal.expression(a), GraftSqlInternal.expression(b)))

  /** `a . b` in float64. */
  def dot(a: Column, b: Column): Column = wrap2(DotProduct.apply)(a, b)

  /** Dot over elements `[start, end)` of both vectors (record.go:79-84). */
  def dotRange(a: Column, b: Column, start: Int, end: Int): Column =
    dot(slice(a, start + 1, end - start), slice(b, start + 1, end - start))

  /** Dot over the first `elems` elements (record.go:87-89). */
  def dotSub(a: Column, b: Column, elems: Int): Column = dotRange(a, b, 0, elems)

  /** L2 norm (record.go:92-94). */
  def magnitude(a: Column): Column =
    GraftSqlInternal.column(VectorMagnitude(GraftSqlInternal.expression(a)))

  /** Cosine similarity; 0.0 (not NaN) on zero magnitude (record.go:97-103). */
  def cosine(a: Column, b: Column): Column = wrap2(CosineSimilarity.apply)(a, b)

  def cosineRange(a: Column, b: Column, start: Int, end: Int): Column =
    cosine(slice(a, start + 1, end - start), slice(b, start + 1, end - start))

  def cosineSub(a: Column, b: Column, elems: Int): Column =
    cosineRange(a, b, 0, elems)

  /** Weighted Jaccard, reference semantics (record.go:130-147). */
  def jaccard(a: Column, b: Column): Column = wrap2(WeightedJaccard.apply)(a, b)

  def jaccardRange(a: Column, b: Column, start: Int, end: Int): Column =
    jaccard(slice(a, start + 1, end - start), slice(b, start + 1, end - start))

  /** i-th element, 0-based like the reference's Record.Get (record.go:58-60). */
  def get(a: Column, i: Int): Column = element_at(a, i + 1)

  /** Metadata value by key, "" when absent (record.go:64-66). */
  def metaValue(meta: Column, key: String): Column =
    coalesce(element_at(meta, lit(key)), lit(""))

  /** Row-major flat offset of an n-d index against a static shape — the
    * reference's `Record.shape` semantics (proto/sum.proto:51-56; shape
    * defaults to 1-D [len] when absent, node/storage/records.go:126-129).
    */
  def ndOffset(shape: Seq[Int], idx: Seq[Int]): Int = {
    require(shape.length == idx.length && shape.nonEmpty,
      s"shape/index rank mismatch: $shape vs $idx")
    idx.zip(shape).foreach { case (i, s) =>
      require(i >= 0 && i < s, s"index $idx out of shape $shape") }
    idx.indices.tail.foldLeft(idx.head)((acc, d) => acc * shape(d) + idx(d))
  }

  /** 0-based n-d element access over the flat data vector. */
  def ndGet(data: Column, shape: Seq[Int], idx: Seq[Int]): Column =
    get(data, ndOffset(shape, idx))

  /** Row `r` of a row-major (rows x cols) record: elements
    * [r*cols, (r+1)*cols) of the flat vector.
    */
  def matrixRow(data: Column, cols: Int, r: Int): Column =
    slice(data, r * cols + 1, cols)

  /** Reshape a flat vector into `rows` nested row-arrays (row-major). */
  def reshapeRows(data: Column, rows: Int, cols: Int): Column =
    transform(sequence(lit(0), lit(rows - 1)),
      r => slice(data, r * lit(cols) + lit(1), lit(cols)))

  /** Element-wise vector equality (record.go:69-71). */
  def vecEqual(a: Column, b: Column): Column = a === b

  /** Validated k argument for the SQL form of graft_minhash_signature:
    * must be present and a foldable integer literal (evaluating a
    * non-foldable expression here would read an unbound attribute).
    */
  private[graft] def minhashK(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Int =
    literalInt(es, 2, "graft_minhash_signature")

  /** Shared SQL-surface guard: argument list of exactly `arity` whose last
    * element is a foldable integer (the expression-constructor parameter).
    */
  private[graft] def literalInt(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      arity: Int, fn: String): Int = {
    require(es.length == arity, s"$fn takes $arity arguments, got ${es.length}")
    require(es.last.foldable, s"$fn's last argument must be a literal integer")
    es.last.eval().asInstanceOf[Number].intValue()
  }

  /** Register SQL names (graft_dot, graft_cosine, ...) in this session so the
    * expressions are also usable from `spark.sql` / `expr` strings.
    */
  def registerSql(spark: SparkSession): Unit = {
    GraftSqlInternal.registerFunction(spark, "graft_dot",
      es => DotProduct(es(0), es(1)))
    GraftSqlInternal.registerFunction(spark, "graft_cosine",
      es => CosineSimilarity(es(0), es(1)))
    GraftSqlInternal.registerFunction(spark, "graft_jaccard",
      es => WeightedJaccard(es(0), es(1)))
    GraftSqlInternal.registerFunction(spark, "graft_magnitude",
      es => VectorMagnitude(es.head))
    GraftSqlInternal.registerFunction(spark, "graft_minhash_signature",
      es => MinhashSignature(es(0), minhashK(es)))
    GraftSqlInternal.registerFunction(spark, "graft_sign_pack", es => {
      require(es.length == 1 || es.length == 2,
        s"graft_sign_pack(vec[, wordBits]) takes 1-2 arguments, got ${es.length}")
      val bits =
        if (es.length < 2) 32
        else {
          require(es(1).foldable, "graft_sign_pack's wordBits must be a literal")
          es(1).eval().asInstanceOf[Number].intValue()
        }
      SignPack(es(0), bits)
    })
    GraftSqlInternal.registerFunction(spark, "graft_hamming",
      es => HammingWords(es(0), es(1)))
    GraftSqlInternal.registerFunction(spark, "graft_kgram_hashes60",
      es => KgramHashes60(es(0), literalInt(es, 2, "graft_kgram_hashes60")))
    GraftSqlInternal.registerFunction(spark, "graft_chargram_pairs48",
      es => CharGramPairs48(es(0), literalInt(es, 2, "graft_chargram_pairs48")))
    GraftSqlInternal.registerFunction(spark, "graft_wordgram_pairs48",
      es => WordGramPairs48(es(0), literalInt(es, 2, "graft_wordgram_pairs48")))
    // Keep in lockstep with GraftExtensions.apply — the two registration
    // surfaces (session-level here, spark.sql.extensions there) must
    // expose the same names.
    GraftSqlInternal.registerFunction(spark, "graft_winnow_mins",
      es => WinnowMins(es(0), literalInt(es, 2, "graft_winnow_mins")))
    GraftSqlInternal.registerFunction(spark, "graft_char_entropy",
      es => CharEntropy(es.head))
    GraftSqlInternal.registerFunction(spark, "graft_nfc",
      es => NfcNormalize(es.head))
  }
}
