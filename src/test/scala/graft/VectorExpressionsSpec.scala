package graft

import org.apache.spark.sql.functions._

import graft.functions.vector._

/** Vector-op correctness with the reference's hand-computed expectations
  * (node/wrapper/record_test.go): dot of [3,6,9] with itself = 126, cosine
  * of parallel vectors = 1, zero-magnitude cosine = 0 (not NaN), and the
  * weighted-Jaccard m11/m10 semantics.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*): Seq[Float] = xs

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getDouble(0)

  private val a = array(Seq(3f, 6f, 9f).map(lit): _*)

  test("dot of [3,6,9] with itself is 126 (record_test.go)") {
    assert(one(dot(a, a)) === 126.0)
  }

  test("magnitude is sqrt(dot(self,self))") {
    assert(math.abs(one(magnitude(a)) - math.sqrt(126.0)) < 1e-12)
  }

  test("cosine of parallel vectors is 1") {
    val b = array(Seq(6f, 12f, 18f).map(lit): _*)
    assert(math.abs(one(cosine(a, b)) - 1.0) < 1e-12)
  }

  test("cosine with zero-magnitude vector is 0.0, not NaN (record.go:97-103)") {
    val z = array(Seq(0f, 0f, 0f).map(lit): _*)
    assert(one(cosine(a, z)) === 0.0)
  }

  test("jaccard binary: m11=2, m10=2 -> 0.5 (record.go:130-147)") {
    val x = array(Seq(1f, 1f, 1f, 0f).map(lit): _*)
    val y = array(Seq(1f, 1f, 0f, 1f).map(lit): _*)
    // m11 = 1*1 + 1*1 = 2; positions 2,3 have x+y == 1 -> m10 = 2
    assert(one(jaccard(x, y)) === 0.5)
  }

  test("jaccard zero denominator -> 0.0") {
    val z = array(Seq(0f, 0f).map(lit): _*)
    assert(one(jaccard(z, z)) === 0.0)
  }

  test("dotRange/dotSub match manual slices (record.go:79-89)") {
    val x = array(Seq(1f, 2f, 3f, 4f).map(lit): _*)
    val y = array(Seq(10f, 20f, 30f, 40f).map(lit): _*)
    assert(one(dotRange(x, y, 1, 3)) === (2 * 20 + 3 * 30).toDouble)
    assert(one(dotSub(x, y, 2)) === (1 * 10 + 2 * 20).toDouble)
  }

  test("expressions work over dataset columns and codegen") {
    val df = Seq(
      (1L, vec(1f, 0f, 0f), vec(1f, 0f, 0f)),
      (2L, vec(1f, 0f, 0f), vec(0f, 1f, 0f)),
      (3L, vec(0f, 0f, 0f), vec(1f, 1f, 1f))
    ).toDF("id", "a", "b")
    val rows = df.select($"id", cosine($"a", $"b").as("c")).orderBy($"id").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("double arrays and mixed float/double inputs work") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0f, 4.0f))).toDF("d", "f")
    val r = df.select(dot($"d", $"f").as("r")).collect().head.getDouble(0)
    assert(r === 11.0)
  }

  test("null input yields null") {
    val df = Seq((Seq(1f), Option.empty[Seq[Float]])).toDF("a", "b")
    assert(df.select(dot($"a", $"b")).collect().head.isNullAt(0))
  }

  test("SQL registration exposes graft_* functions") {
    registerSql(spark)
    val r = spark.sql("SELECT graft_dot(array(3.0F,6.0F,9.0F), array(3.0F,6.0F,9.0F)) r")
      .collect().head.getDouble(0)
    assert(r === 126.0)
    // Signature from SQL: min over one pair is the pair's member values.
    val sig = spark.sql(
      "SELECT graft_minhash_signature(array(named_struct('h1', 5L, 'h2', 11L)), 3) s")
      .collect().head.getSeq[Long](0)
    assert(sig === Seq(5L, 16L, 27L))
    // 1-bit family: pack [1, -1, 0, 2] -> bits {0, 3} = 9; hamming vs
    // bit 0 alone = disagreement on bit 3 only.
    val packed = spark.sql(
      "SELECT graft_sign_pack(array(1.0F, -1.0F, 0.0F, 2.0F)) s")
      .collect().head.getSeq[Long](0)
    assert(packed === Seq(9L))
    val ham = spark.sql(
      "SELECT graft_hamming(array(9L), array(1L)) h")
      .collect().head.getInt(0)
    assert(ham === 1)
    // Text-hash family: the fused gram sweeps agree with the expression
    // chains they fused (md5-derived, so spot-check against SQL md5/conv).
    val kg = spark.sql(
      "SELECT graft_kgram_hashes60('abcdefgh', 8) h, " +
        "CAST(conv(substring(md5('0:abcdefgh'), 1, 15), 16, 10) AS BIGINT) e")
      .collect().head
    assert(kg.getSeq[Long](0) === Seq(kg.getLong(1)))
    val cg = spark.sql(
      "SELECT graft_chargram_pairs48('abcde', 5) p, " +
        "CAST(conv(substring(md5('abcde'), 1, 12), 16, 10) AS BIGINT) h1, " +
        "CAST(conv(substring(md5('abcde'), 13, 12), 16, 10) AS BIGINT) h2")
      .collect().head
    val pair = cg.getSeq[org.apache.spark.sql.Row](0).head
    assert(pair.getLong(0) === cg.getLong(1))
    assert(pair.getLong(1) === cg.getLong(2))
    // Word-gram variant: one 2-gram over two tokens, space-joined.
    val wg = spark.sql(
      "SELECT graft_wordgram_pairs48('ab cd', 2) p, " +
        "CAST(conv(substring(md5('ab cd'), 1, 12), 16, 10) AS BIGINT) h1")
      .collect().head
    val wpair = wg.getSeq[org.apache.spark.sql.Row](0)
    assert(wpair.length === 1 && wpair.head.getLong(0) === wg.getLong(1))
  }

  test("nd-shape access: ndGet/matrixRow/reshapeRows over a row-major 2x3") {
    // data = [[10, 11, 12], [20, 21, 22]] flattened row-major
    val df = Seq((1L, Seq(10f, 11f, 12f, 20f, 21f, 22f))).toDF("id", "data")
    assert(ndOffset(Seq(2, 3), Seq(1, 2)) === 5)
    val row = df.select(
      ndGet($"data", Seq(2, 3), Seq(0, 1)).as("e01"),
      ndGet($"data", Seq(2, 3), Seq(1, 2)).as("e12"),
      matrixRow($"data", 3, 1).as("r1"),
      org.apache.spark.sql.functions.size(reshapeRows($"data", 2, 3)).as("nr"),
      org.apache.spark.sql.functions.element_at(
        reshapeRows($"data", 2, 3), 2).as("row2")).collect().head
    assert(row.getFloat(0) === 11f && row.getFloat(1) === 22f)
    assert(row.getSeq[Float](2) === Seq(20f, 21f, 22f))
    assert(row.getInt(3) === 2)
    assert(row.getSeq[Float](4) === Seq(20f, 21f, 22f))
    intercept[IllegalArgumentException] { ndOffset(Seq(2, 3), Seq(2, 0)) }
    intercept[IllegalArgumentException] { ndOffset(Seq(2, 3), Seq(0)) }
  }

  test("the two SQL registration surfaces expose the same graft_* names") {
    // registerSql (session-level) and GraftExtensions (spark.sql.extensions)
    // are maintained by hand in two files; a name added to one and not the
    // other ships an inconsistent SQL surface. Drive both into fresh
    // sessions (independent registries, shared context) and compare.
    import org.apache.spark.sql.GraftSqlInternal
    val viaRegister = spark.newSession()
    graft.functions.vector.registerSql(viaRegister)
    val viaExtensions = spark.newSession()
    GraftSqlInternal.applyFunctionExtensions(
      viaExtensions, new GraftExtensions)
    def graftNames(s: org.apache.spark.sql.SparkSession): Set[String] =
      GraftSqlInternal.functionNames(s).filter(_.startsWith("graft_")).toSet
    val a = graftNames(viaRegister)
    val b = graftNames(viaExtensions)
    assert(a === b, s"surfaces drifted: only-register=${a -- b}, " +
      s"only-extensions=${b -- a}")
    assert(a.nonEmpty)
    // And the extensions-injected functions actually evaluate.
    val r = viaExtensions.sql(
      "SELECT graft_hamming(graft_sign_pack(array(CAST(1.0 AS FLOAT), " +
        "CAST(-1.0 AS FLOAT))), graft_sign_pack(array(CAST(1.0 AS FLOAT), " +
        "CAST(1.0 AS FLOAT)))) d").collect().head.getInt(0)
    assert(r === 1)
  }
}
