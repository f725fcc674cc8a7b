package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vector._

/** Vector/record operator coverage — the reference's oracle surface
  * (node/wrapper/record.go) expressed as Spark plans over the `embeddings`
  * table (64-dim float32, L2-normalized).
  *
  * The reference's flagship pattern — resolve one record by id, compare it
  * against every other record (master/mux_runner.go's AST-patched
  * `records.Find` + full scan) — becomes: take the single reference row,
  * cross-join it as a broadcast (one row), and evaluate the codegen'd
  * similarity expression in a scan-filter. No shuffle of the big side at
  * all; at 100 TB this is a map-only job.
  *
  * Oracles use DuckDB list functions CAST to DOUBLE[] so both engines
  * accumulate in float64 in index order; computed doubles are rounded to 6
  * digits to absorb last-bit drift.
  */
object VectorQueries {

  private val RefId = 0L

  /** PQ codebook size tracks corpus size (the k-means train-size rule:
    * ~64 training vectors per centroid, clamped to [32, 256] — 32 is the
    * gate floor where 500 vectors train soundly, 256 the 8-bit code
    * ceiling), rounded down to a power of two so cache keys stay stable
    * as corpora grow incrementally. Fixed ksub=32 measured recall 0.35 at
    * the 500-vector gate but 0.125 at the 20k-vector sf1 replay (below
    * the 0.15 contract floor); ksub=256 restores 0.30 there. Same class
    * of sizing law as e13's bits-per-band ~ log2(n).
    */
  private def ksubFor(n: Long): Int =
    // Clamp in Long BEFORE narrowing: at n/64 >= 2^31 a .toInt would wrap
    // negative and the clamps would silently yield the 32 gate floor —
    // the exact gate-constant regression this sizing law replaced.
    math.min(256L, math.max(32L,
      java.lang.Long.highestOneBit(math.max(1L, n / 64L)))).toInt

  /** Binary-quantization shortlist multiple: 64-bit sign codes carry
    * FIXED information, so covering the true top-k at a growing corpus
    * needs a proportionally larger Hamming shortlist (~n/500 candidates
    * per k, gate-floored at 4x). At sf1 overfetch=4 measured recall
    * 0.245 (floor 0.50) vs 0.69 at the scaled 40x — still a 2% scan
    * before the exact re-rank.
    */
  private def overfetchFor(n: Long): Int =
    math.max(4, math.ceil(n / 500.0).toInt)

  /** The one-row reference vector, aliased for a broadcast nested-loop join. */
  private def refVec(t: Tables) =
    broadcast(t.embeddings.filter(col("vec_id") === RefId)
      .select(col("embedding").as("ref_embedding")))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "v01_dot",
      (s, dir) => {
        val t = Tables(s, dir)
        t.embeddings.crossJoin(refVec(t))
          .select(col("vec_id"),
            round(dot(col("embedding"), col("ref_embedding")), 6).as("dot_ref"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        |SELECT e.vec_id,
        |       round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                              CAST(r.embedding AS DOUBLE[])), 6) AS dot_ref
        |FROM embeddings e,
        |     (SELECT embedding FROM embeddings WHERE vec_id = $RefId) r
        |ORDER BY e.vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // The reference's flagship query: findSimilar(id, threshold) —
      // cosine of every other record against the resolved reference record
      // (README.md:139-166, master/service_bench_test.go:171-187).
      "v02_find_similar",
      (s, dir) => {
        val t = Tables(s, dir)
        t.embeddings.crossJoin(refVec(t))
          .filter(col("vec_id") =!= RefId)
          .withColumn("sim",
            round(cosine(col("embedding"), col("ref_embedding")), 6))
          .filter(col("sim") >= 0.25)
          .select(col("vec_id"), col("sim"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        |SELECT e.vec_id,
        |       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                    CAST(r.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings e,
        |     (SELECT embedding FROM embeddings WHERE vec_id = $RefId) r
        |WHERE e.vec_id <> $RefId
        |  AND round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                   CAST(r.embedding AS DOUBLE[])), 6) >= 0.25
        |ORDER BY e.vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // Per-record scalar surface: Get / Size / Magnitude / DotSub /
      // CosineRange (record.go:58-60, 87-89, 92-94, 118-127).
      "v03_vector_stats",
      (s, dir) => {
        val t = Tables(s, dir)
        // + 0.0 after every round: IEEE says -0.0 + 0.0 == +0.0 and is
        // the identity elsewhere, so a value that rounds to zero gets ONE
        // sign in both engines (the sf10 replay caught round(-3e-8, 6)
        // shipping as 0.0 here and -0.0 from the oracle — a repr-level
        // hash break on equal values). Same normalization in the SQL.
        def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0d)
        t.embeddings.crossJoin(refVec(t))
          .select(
            col("vec_id"),
            r6(graft.functions.vector.get(col("embedding"), 0).cast("double"))
              .as("elem0"),
            size(col("embedding")).as("dims"),
            r6(magnitude(col("embedding"))).as("mag"),
            r6(dotSub(col("embedding"), col("ref_embedding"), 32))
              .as("dot_first32"),
            r6(cosineRange(col("embedding"), col("ref_embedding"), 16, 48))
              .as("cos_16_48"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        |SELECT e.vec_id,
        |       round(CAST(e.embedding[1] AS DOUBLE), 6) + 0.0                 AS elem0,
        |       len(e.embedding)                                               AS dims,
        |       round(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                   CAST(e.embedding AS DOUBLE[]))), 6) + 0.0 AS mag,
        |       round(list_dot_product(CAST(e.embedding[1:32] AS DOUBLE[]),
        |                              CAST(r.embedding[1:32] AS DOUBLE[])), 6) + 0.0 AS dot_first32,
        |       round(list_cosine_similarity(CAST(e.embedding[17:48] AS DOUBLE[]),
        |                                    CAST(r.embedding[17:48] AS DOUBLE[])), 6) + 0.0 AS cos_16_48
        |FROM embeddings e,
        |     (SELECT embedding FROM embeddings WHERE vec_id = $RefId) r
        |ORDER BY e.vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // Weighted Jaccard on binarized vectors (the reference intends binary
      // inputs, record.go:130-147). With 0/1 vectors m10+m11 reduces to
      // |A|+|B|-|A∩B| — classic set Jaccard — which the oracle computes in
      // closed form from exact integer-valued sums.
      "v04_jaccard_binary",
      (s, dir) => {
        val t = Tables(s, dir)
        def binarize(c: org.apache.spark.sql.Column) =
          transform(c, x => when(x > 0f, 1.0d).otherwise(0.0d))
        t.embeddings.crossJoin(refVec(t))
          .filter(col("vec_id") =!= RefId)
          .select(col("vec_id"),
            round(jaccard(binarize(col("embedding")),
              binarize(col("ref_embedding"))), 6).as("jac"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        |WITH b AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |                        x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END) AS bv
        |  FROM embeddings
        |)
        |SELECT e.vec_id,
        |       round(CASE WHEN list_sum(e.bv) + list_sum(r.bv)
        |                       - list_dot_product(e.bv, r.bv) = 0 THEN 0.0
        |                  ELSE list_dot_product(e.bv, r.bv)
        |                       / (list_sum(e.bv) + list_sum(r.bv)
        |                          - list_dot_product(e.bv, r.bv)) END, 6) AS jac
        |FROM b e, (SELECT bv FROM b WHERE vec_id = $RefId) r
        |WHERE e.vec_id <> $RefId
        |ORDER BY e.vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // Brute-force cosine top-k neighbors for 10 probe vectors: the exact
      // baseline for ANN. Probe side is tiny -> broadcast; rank per probe
      // on (rounded sim desc, vec_id) so ordering is engine-independent.
      "v05_knn_bruteforce",
      (s, dir) => {
        val t = Tables(s, dir)
        val probes = broadcast(
          t.embeddings.filter(col("vec_id") < 10)
            .select(col("vec_id").as("query_id"),
              col("embedding").as("query_embedding")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))
        t.embeddings.crossJoin(probes)
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("sim",
            round(cosine(col("embedding"), col("query_embedding")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 5)
          .select(col("query_id"), col("rnk"), col("vec_id"), col("sim"))
          .orderBy(col("query_id"), col("rnk"))
      },
      Some("""
        |WITH sims AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])), 6) AS sim
        |  FROM embeddings e, embeddings q
        |  WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id
        |),
        |ranked AS (
        |  SELECT query_id, vec_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |)
        |SELECT query_id, rnk, vec_id, sim
        |FROM ranked WHERE rnk <= 5
        |ORDER BY query_id, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // findDoubles parity: pairs of records with element-wise equal vectors
      // (Record.Equal, record.go:69-71; findDoubles oracle,
      // master/service_test.go:260-342). Array equality is exact on the
      // raw float32s — no rounding involved. The testdata has no natural
      // doubles (this row passed vacuously at 0 rows for three rounds), so
      // the query PLANTS them: a shifted-id copy of the vec_id < 20 slice
      // is unioned in on both engines, making every planted (i, i+10^6)
      // pair — and nothing else — a double the equality join must find.
      "v06_find_doubles",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = t.embeddings.select(col("vec_id"), col("embedding"))
        val planted = base.filter(col("vec_id") < 20)
          .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
        val all = base.unionByName(planted)
        val a = all.select(col("vec_id").as("id_a"),
          col("embedding").as("emb_a"))
        val b = all.select(col("vec_id").as("id_b"),
          col("embedding").as("emb_b"))
        a.join(b, col("id_a") < col("id_b") && col("emb_a") === col("emb_b"))
          .select(col("id_a"), col("id_b"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        |WITH all_recs AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id < 20
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM all_recs a, all_recs b
        |WHERE a.vec_id < b.vec_id AND a.embedding = b.embedding
        |ORDER BY id_a, id_b
        |""".stripMargin.trim)),

    QueryDef(
      // JaccardRange (record.go:150-168): the weighted Jaccard over vector
      // elements [16, 48), on binarized inputs. Same closed-form oracle as
      // v04 restricted to the slice — all integer-valued arithmetic.
      "v07_jaccard_range",
      (s, dir) => {
        val t = Tables(s, dir)
        def binarize(c: org.apache.spark.sql.Column) =
          transform(c, x => when(x > 0f, 1.0d).otherwise(0.0d))
        t.embeddings.crossJoin(refVec(t))
          .filter(col("vec_id") =!= RefId)
          .select(col("vec_id"),
            round(jaccardRange(binarize(col("embedding")),
              binarize(col("ref_embedding")), 16, 48), 6).as("jac_16_48"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        |WITH b AS (
        |  SELECT vec_id,
        |         list_transform(CAST(embedding[17:48] AS DOUBLE[]),
        |                        x -> CASE WHEN x > 0 THEN 1.0 ELSE 0.0 END) AS bv
        |  FROM embeddings
        |)
        |SELECT e.vec_id,
        |       round(CASE WHEN list_sum(e.bv) + list_sum(r.bv)
        |                       - list_dot_product(e.bv, r.bv) = 0 THEN 0.0
        |                  ELSE list_dot_product(e.bv, r.bv)
        |                       / (list_sum(e.bv) + list_sum(r.bv)
        |                          - list_dot_product(e.bv, r.bv)) END, 6) AS jac_16_48
        |FROM b e, (SELECT bv FROM b WHERE vec_id = $RefId) r
        |WHERE e.vec_id <> $RefId
        |ORDER BY e.vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // Per-label embedding centroids (class prototypes): element-wise
      // mean over the vector column. posexplode → (label, dim) aggregate —
      // partial map-side combine, one keyed shuffle of scalar sums; never
      // materializes a per-group vector list. Output as (label, dim, avg)
      // rows so the oracle compares scalars.
      "v08_centroids",
      (s, dir) => {
        val t = Tables(s, dir)
        t.embeddings
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy(col("label"), col("dim").cast("long").as("dim"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("x").cast("double")), 6).as("avg_val"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""
        |SELECT label, d.d AS dim, count(*) AS n,
        |       round(avg(CAST(embedding[CAST(d.d AS INTEGER) + 1] AS DOUBLE)), 6)
        |         AS avg_val
        |FROM embeddings, range(64) d(d)
        |GROUP BY label, d.d
        |ORDER BY label, dim
        |""".stripMargin.trim)),

    QueryDef(
      // IVF ANN at the query surface: build the seeded index, search
      // top-5 for the 20 smallest vec_ids scanning nprobe=4 of 16 cells.
      // Deterministic (md5-seeded init, fixed iteration count) but the
      // Pruned-probe IVF, made oracle-checkable by asserting its accuracy
      // contract in-query: the nprobe=4 search is scored against the
      // full-probe search over the SAME cached index (nprobe=numCells ==
      // brute force — the guarantee v11 hash-checks against DuckDB). Each
      // probe row carries its exact-checkable result count, and recall_ok
      // asserts corpus recall@5 >= 0.4 (measured 0.53-0.59 across
      // sf0.001/0.01/0.1; deterministic because the k-means init is
      // hash-ordered and centroids are rounded). The k-means math itself
      // is not SQL-expressible — the tolerance booleans are.
      "v09_ivf_topk",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.orderBy(col("vec_id")).limit(20)
        // Index geometry under the sizing laws (Ivf.cellsFor/nprobeFor):
        // the gate corpus (500 vectors) reproduces the 16-cell/4-probe
        // constants the 0.4 recall floor was measured at; larger corpora
        // re-size (cells ~ sqrt(n), nprobe ~ cells^(2/3)) so the routed
        // scan stays sublinear. Measured recall@5 vs full probe: 0.53 at
        // the gate, 0.53 at sf10's 512-cell/41-probe geometry — the
        // floor holds at its gate margin while the routed fraction falls
        // 25% -> 8% (sqrt nprobe growth measured 0.35 there, under the
        // floor; nprobeFor's scaladoc has the sweep).
        val cells = graft.ops.Ivf.cellsFor(emb.count())
        val idx = graft.ops.Ivf.buildCached(emb, "vec_id", "embedding",
          numCells = cells, iterations = 1)
        val pruned = graft.ops.Ivf.search(idx, probes, "vec_id", "embedding",
          k = 5, nprobe = graft.ops.Ivf.nprobeFor(cells, 16, 4))
        val full = graft.ops.Ivf.search(idx, probes, "vec_id", "embedding",
            k = 5, nprobe = cells)
          .select(col("query_id").as("fq"), col("vec_id").as("fv"))
        pruned
          .join(full, pruned("query_id") === col("fq") &&
            pruned("vec_id") === col("fv"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_ret"), count(col("fv")).as("hits"))
          .withColumn("recall_ok", sum(col("hits")).over() >= 40L)
          .select(col("query_id"), col("n_ret"), col("recall_ok"))
          .orderBy(col("query_id"))
      },
      Some("""
        |SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_ret,
        |       TRUE AS recall_ok
        |FROM embeddings ORDER BY vec_id LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // Symmetric max-abs int8 quantization — the embedding-compression
      // pass a serving pipeline runs before shipping vectors. Exact
      // cross-engine: per-row scalar IEEE chains (cast, *, /, floor) are
      // bit-deterministic; only reduction ORDER varies between engines,
      // and max() is order-insensitive.
      "v10_quantize",
      (s, dir) => {
        val t = Tables(s, dir)
        val withScale = t.embeddings.select(col("vec_id"), col("embedding"),
          aggregate(col("embedding"), lit(0.0d),
            (acc, x) => greatest(acc, abs(x.cast("double")))).as("maxabs"))
          .filter(col("maxabs") > 0)
        withScale
          .select(col("vec_id"),
            transform(col("embedding"),
              x => floor(x.cast("double") * lit(127.0d) / col("maxabs"))).as("qv"))
          .select(col("vec_id"),
            element_at(col("qv"), 1).as("q0"),
            element_at(col("qv"), 32).as("q31"),
            element_at(col("qv"), 64).as("q63"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("sum_q"))
          .orderBy(col("vec_id"))
      },
      Some("""
        |WITH m AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                 x -> abs(x))) AS maxabs
        |  FROM embeddings
        |),
        |q AS (
        |  SELECT vec_id,
        |         list_transform(e, x -> floor(x * 127.0 / maxabs)) AS qv
        |  FROM m WHERE maxabs > 0
        |)
        |SELECT vec_id,
        |       CAST(qv[1] AS BIGINT)  AS q0,
        |       CAST(qv[32] AS BIGINT) AS q31,
        |       CAST(qv[64] AS BIGINT) AS q63,
        |       CAST(list_sum(qv) AS BIGINT) AS sum_q
        |FROM q
        |ORDER BY vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // The IVF machinery end-to-end against an exact oracle: with
      // nprobe == numCells every cell is scanned, so the routed search
      // must equal brute force bit-for-bit (same rounding, same
      // (sim desc, vec_id) tie-break). v09 keeps the nprobe<cells scale
      // path; this pins the index's correctness through the driver gate.
      "v11_ivf_exact",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.orderBy(col("vec_id")).limit(20)
        // Sized by the law but probed in FULL (nprobe == cells): exact
        // equality to brute force holds for ANY cell count, so the law
        // changes cost shape only, never this oracle's hash.
        val cells = graft.ops.Ivf.cellsFor(emb.count())
        val idx = graft.ops.Ivf.buildCached(emb, "vec_id", "embedding",
          numCells = cells, iterations = 1)
        graft.ops.Ivf.search(idx, probes, "vec_id", "embedding", k = 5,
            nprobe = cells)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some("""
        |WITH probes AS (
        |  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 20
        |),
        |sims AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])), 6) AS sim
        |  FROM embeddings e, probes q
        |  WHERE e.vec_id <> q.vec_id
        |),
        |ranked AS (
        |  SELECT query_id, vec_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |)
        |SELECT query_id, rnk, vec_id, sim
        |FROM ranked WHERE rnk <= 5
        |ORDER BY query_id, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // n-d shape parity (Record.shape, proto/sum.proto:51-56): the 64-dim
      // embedding viewed as a row-major 8x8 matrix. Scalar chains are
      // explicit left-associative float64 adds in index order on BOTH
      // engines, so every value is bit-identical before the rounding.
      "v12_ndshape",
      (s, dir) => {
        val t = Tables(s, dir)
        val shape = Seq(8, 8)
        def d(c: org.apache.spark.sql.Column) = c.cast("double")
        val data = col("embedding")
        val trace = (0 until 8)
          .map(i => d(graft.functions.vector.ndGet(data, shape, Seq(i, i))))
          .reduce(_ + _)
        val row3 = (0 until 8)
          .map(j => d(graft.functions.vector.ndGet(data, shape, Seq(3, j))))
          .reduce(_ + _)
        val col5 = (0 until 8)
          .map(i => d(graft.functions.vector.ndGet(data, shape, Seq(i, 5))))
          .reduce(_ + _)
        // v03's zero-sign normalization: + 0.0 after round in BOTH
        // engines (round(-4e-7, 6) shipped 0.0 here, -0.0 from the
        // oracle at sf10).
        def r6(c: org.apache.spark.sql.Column) = round(c, 6) + lit(0.0d)
        t.embeddings.select(col("vec_id"),
          r6(trace).as("trace"),
          r6(row3).as("row3_sum"),
          r6(col5).as("col5_sum"),
          r6(d(graft.functions.vector.ndGet(data, shape, Seq(2, 3))))
            .as("elem_2_3"),
          r6(graft.functions.vector.magnitude(
            graft.functions.vector.matrixRow(data, 8, 0))).as("row0_mag"),
          size(graft.functions.vector.reshapeRows(data, 8, 8)).as("n_rows"))
          .orderBy(col("vec_id"))
      },
      Some({
        def e(pos: Int) = s"CAST(embedding[$pos] AS DOUBLE)"
        val trace = (0 until 8).map(i => e(i * 8 + i + 1)).mkString(" + ")
        val row3 = (0 until 8).map(j => e(3 * 8 + j + 1)).mkString(" + ")
        val col5 = (0 until 8).map(i => e(i * 8 + 5 + 1)).mkString(" + ")
        s"""
        |SELECT vec_id,
        |       round($trace, 6) + 0.0 AS trace,
        |       round($row3, 6) + 0.0 AS row3_sum,
        |       round($col5, 6) + 0.0 AS col5_sum,
        |       round(${e(2 * 8 + 3 + 1)}, 6) + 0.0 AS elem_2_3,
        |       round(sqrt(list_dot_product(CAST(embedding[1:8] AS DOUBLE[]),
        |                                   CAST(embedding[1:8] AS DOUBLE[]))), 6) + 0.0
        |         AS row0_mag,
        |       8 AS n_rows
        |FROM embeddings
        |ORDER BY vec_id
        |""".stripMargin.trim
      })),

    QueryDef(
      // Maximum-inner-product top-k (un-normalized retrieval scoring):
      // broadcast probes, map-side codegen'd dot, bounded per-probe
      // window — same zero-shuffle scan shape as v05. The MIPS->cosine
      // norm-augmentation reduction (Similarity.augmentCorpusForMips)
      // plugs this workload into the IVF/sign-LSH indexes at scale;
      // rank equivalence is asserted in OpsSpec.
      "v13_mips",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ops.Similarity.mipsTopK(t.embeddings,
            t.embeddings.filter(col("vec_id") % 40 === 0),
            "vec_id", "embedding", k = 5)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some("""
        |WITH ips AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         round(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])), 6) AS ip
        |  FROM embeddings e, embeddings q
        |  WHERE q.vec_id % 40 = 0 AND e.vec_id <> q.vec_id
        |),
        |ranked AS (
        |  SELECT query_id, vec_id, ip,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY ip DESC, vec_id) AS rnk
        |  FROM ips
        |)
        |SELECT query_id, rnk, vec_id, ip
        |FROM ranked WHERE rnk <= 5
        |ORDER BY query_id, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // CosineSub (record.go:106-111): cosine over the first n elements of
      // both vectors — the last §2.1 vector verb without its own
      // driver-checked row (previously ScalaTest-only via PropertySpec).
      "v14_cosine_sub",
      (s, dir) => {
        val t = Tables(s, dir)
        t.embeddings.crossJoin(refVec(t))
          .filter(col("vec_id") =!= RefId)
          .select(col("vec_id"),
            round(cosineSub(col("embedding"), col("ref_embedding"), 24), 6)
              .as("cos_first24"))
          .orderBy(col("vec_id"))
      },
      Some(s"""
        |SELECT e.vec_id,
        |       round(list_cosine_similarity(CAST(e.embedding[1:24] AS DOUBLE[]),
        |                                    CAST(r.embedding[1:24] AS DOUBLE[])), 6)
        |         AS cos_first24
        |FROM embeddings e,
        |     (SELECT embedding FROM embeddings WHERE vec_id = $RefId) r
        |WHERE e.vec_id <> $RefId
        |ORDER BY e.vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // Scalar int8 quantization (graft.ops.Quantize): per-dim min/max in
      // one partial-aggregated pass, then a map-only fused AffineQuantize
      // scan — the 4x storage compression for corpus-scale embeddings.
      // Every arithmetic step is exact IEEE double math (no
      // transcendentals), so the ORACLE CROSS-CHECKS THE FULL QUANTIZED
      // CONTENT via a corpus-wide checksum (sum of all levels) plus the
      // per-dim level spread — not a tolerance contract. mse_ok ties the
      // reconstruction to the analytic half-step bound through the
      // codegen'd dot identity ||x - x̂||² = x.x - 2x.x̂ + x̂.x̂.
      "v15_quantize",
      (s, dir) => {
        val t = Tables(s, dir)
        val model = graft.ops.Quantize.fit(t.embeddings, "embedding")
        val q = t.embeddings.select(col("vec_id"), col("embedding"),
          graft.ops.Quantize.quantize(col("embedding"), model).as("q"))
        val mseOk = q.select(
            graft.ops.Quantize.mseColumn(col("embedding"),
              graft.ops.Quantize.dequantize(col("q"), model)).as("mse"))
          .agg(max(col("mse"))).head.getDouble(0) <=
          graft.ops.Quantize.mseBound(model)
        q.select(posexplode(col("q")).as(Seq("i", "qv")))
          .agg(count(lit(1)).as("n_vals"),
            sum(col("qv")).as("q_checksum"),
            countDistinct(col("qv")).as("n_levels"))
          .select(col("n_vals"), col("q_checksum"), col("n_levels"),
            lit(mseOk).as("mse_ok"))
      },
      Some("""
        |WITH el AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |),
        |st AS (
        |  SELECT i, min(x) AS mn, max(x) AS mx FROM el GROUP BY i
        |),
        |q AS (
        |  SELECT CAST(LEAST(255, GREATEST(0,
        |           FLOOR((x - mn) * (CASE WHEN mx > mn
        |                             THEN 255.0 / (mx - mn)
        |                             ELSE 0 END) + 0.5))) AS BIGINT) AS qv
        |  FROM el JOIN st USING (i)
        |)
        |SELECT count(*) AS n_vals,
        |       CAST(sum(qv) AS BIGINT) AS q_checksum,
        |       count(DISTINCT qv) AS n_levels,
        |       TRUE AS mse_ok
        |FROM q
        |""".stripMargin.trim)),

    QueryDef(
      // Product quantization (graft.ops.Pq): 64-dim float32 -> 8 codes of
      // 5 bits (51x), scored asymmetrically (per-probe ADC table, m
      // lookups per corpus row). PQ internals are not SQL-replayable, so
      // — like a01/v09 — the query asserts the accuracy contract
      // IN-QUERY: top-10 recall of the compressed search vs the exact
      // MIPS ranking must clear a floor (deterministic: fit init, mean
      // rounding, and ranking tiebreaks are all pinned; measured 0.35 at
      // sf0.01 on the near-isotropic synthetic embeddings, PQ's worst
      // case). The exact-checkable columns (probe count, result count =
      // probes x k) gate the plumbing.
      "v16_pq_recall",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val (model, enc) = graft.ops.Pq.encodeCached(emb, "vec_id", "embedding",
          m = 8, ksub = ksubFor(emb.count()))
        val probes = emb.filter(col("vec_id") < 20)
        val pqTop = graft.ops.Pq.adcTopK(enc, probes, "vec_id", "embedding",
            model, k = 10)
          .select(col("query_id"), col("vec_id"))
        val exactTop = graft.ops.Similarity.mipsTopK(emb, probes,
            "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("vec_id"))
        val matches = pqTop.join(exactTop, Seq("query_id", "vec_id"))
        pqTop.agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("n_results"))
          .crossJoin(matches.agg(count(lit(1)).as("n_match")))
          .select(col("n_queries"), col("n_results"),
            (col("n_match").cast("double") /
              col("n_results").cast("double") >= 0.15).as("recall_ok"))
      },
      Some("""
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(count(*) * 10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 20
        |""".stripMargin.trim)),

    QueryDef(
      // The composed IVF-PQ serving path (graft.ops.Pq.ivfPqTopK): coarse
      // router picks nprobe of numCells cells, PQ codes encode the
      // per-cell RESIDUAL, candidates cost m ADC lookups + the stored
      // centroid-dot correction, and only routed cells' code rows are
      // scanned — the standard billion-vector serving layout, end to end.
      // Contract shape as v16: deterministic overall recall vs exact MIPS
      // above a floor (measured 0.315 at sf0.01, floor 0.15), exact
      // probe/result counts gating the plumbing. PqSpec pins the lossless
      // limit (full probe + ksub >= corpus == exact MIPS).
      "v17_ivfpq_recall",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val n = emb.count()
        // costRatio 8 (PQ candidates cost m ADC lookups, ~d/m cheaper
        // than the d-dim routing cosine): the gate corpus reproduces the
        // 8-cell/4-probe constants the 0.15 floor was measured at.
        val cells = graft.ops.Ivf.cellsFor(n, costRatio = 8.0)
        val index = graft.ops.Pq.buildIvfPqCached(emb, "vec_id", "embedding",
          numCells = cells, m = 8, ksub = ksubFor(n))
        val probes = emb.filter(col("vec_id") < 20)
        val routedTop = graft.ops.Pq.ivfPqTopK(index, probes,
            "vec_id", "embedding", k = 10,
            nprobe = graft.ops.Ivf.nprobeFor(cells, 8, 4))
          .select(col("query_id"), col("vec_id"))
        val exactTop = graft.ops.Similarity.mipsTopK(emb, probes,
            "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("vec_id"))
        val matches = routedTop.join(exactTop, Seq("query_id", "vec_id"))
        routedTop.agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("n_results"))
          .crossJoin(matches.agg(count(lit(1)).as("n_match")))
          .select(col("n_queries"), col("n_results"),
            (col("n_match").cast("double") /
              col("n_results").cast("double") >= 0.15).as("recall_ok"))
      },
      Some("""
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(count(*) * 10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 20
        |""".stripMargin.trim)),

    QueryDef(
      // Two-stage retrieval (graft.ops.Pq.ivfPqTopKRerank): the IVF-PQ
      // compressed scan generates a 4x shortlist, then ONLY those rows'
      // raw vectors are fetched (broadcast hash join — one corpus scan,
      // no shuffle) and re-scored by the true inner product. The floor is
      // strictly above v17's: exact stage-2 scoring must recover recall
      // that raw ADC ordering loses (measured 0.595 vs v17's 0.315 at
      // sf0.01; floor 0.40).
      "v18_ivfpq_rerank",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val n = emb.count()
        // Same geometry law as v17 (shared cached index): cells and
        // nprobe re-size in sqrt steps from the measured 8/4 gate point.
        val cells = graft.ops.Ivf.cellsFor(n, costRatio = 8.0)
        val index = graft.ops.Pq.buildIvfPqCached(emb, "vec_id", "embedding",
          numCells = cells, m = 8, ksub = ksubFor(n))
        val probes = emb.filter(col("vec_id") < 20)
        // Rerank depth is a sizing law like v20's shortlist (~n/500,
        // gate-floored at 4x): PQ codes carry FIXED information, so the
        // true top-k's rank in ADC ordering degrades with corpus size and
        // a fixed 4x shortlist starves the exact stage — the sf10 replay
        // measured recall below the 0.40 contract floor at 200k vectors
        // with the same code that passed at 20k.
        val routedTop = graft.ops.Pq.ivfPqTopKRerank(index, emb, probes,
            "vec_id", "embedding", k = 10,
            nprobe = graft.ops.Ivf.nprobeFor(cells, 8, 4),
            rerankFactor = overfetchFor(n))
          .select(col("query_id"), col("vec_id"))
        val exactTop = graft.ops.Similarity.mipsTopK(emb, probes,
            "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("vec_id"))
        val matches = routedTop.join(exactTop, Seq("query_id", "vec_id"))
        routedTop.agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("n_results"))
          .crossJoin(matches.agg(count(lit(1)).as("n_match")))
          .select(col("n_queries"), col("n_results"),
            (col("n_match").cast("double") /
              col("n_results").cast("double") >= 0.40).as("recall_ok"))
      },
      Some("""
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(count(*) * 10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 20
        |""".stripMargin.trim)),

    QueryDef(
      // 1-bit binary quantization + exact Hamming top-k
      // (graft.ops.Quantize.hammingTopK): sign bits packed 32/long by the
      // fused SignPack expression, distance = xor+popcount per word pair.
      // Unlike the v16-v18 recall contracts this ranking is FULLY
      // deterministic from the data (no fitted model), so the oracle
      // replays the identical packing in DuckDB BIGINT math and the
      // result is hash-checked end to end — packing, distance, and the
      // (hamming asc, vec_id asc) tie rule all cross-engine exact.
      "v19_binary_hamming",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.filter(col("vec_id") < 5)
        graft.ops.Quantize.hammingTopK(emb, probes, "vec_id", "embedding",
            k = 10)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some("""
        |WITH sig AS (
        |  SELECT vec_id,
        |         CAST(list_sum(list_transform(range(1, 33), i ->
        |           CASE WHEN embedding[i] > 0
        |                THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END))
        |           AS BIGINT) AS s0,
        |         CAST(list_sum(list_transform(range(33, 65), i ->
        |           CASE WHEN embedding[i] > 0
        |                THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END))
        |           AS BIGINT) AS s1
        |  FROM embeddings
        |),
        |cand AS (
        |  SELECT p.vec_id AS query_id, c.vec_id,
        |         bit_count(xor(p.s0, c.s0)) + bit_count(xor(p.s1, c.s1))
        |           AS hamming
        |  FROM sig p JOIN sig c ON c.vec_id <> p.vec_id
        |  WHERE p.vec_id < 5
        |),
        |r AS (
        |  SELECT query_id, vec_id, hamming,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY hamming, vec_id) AS rnk
        |  FROM cand
        |)
        |SELECT query_id, CAST(rnk AS INT) AS rnk, vec_id,
        |       CAST(hamming AS INT) AS hamming
        |FROM r WHERE rnk <= 10
        |ORDER BY query_id, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // Binary-quantized two-stage search
      // (graft.ops.Quantize.binaryRerankTopK): Hamming shortlist at 4x
      // over the 1-bit signatures (32x-compressed scan), exact cosine
      // re-rank of only the shortlisted raw vectors. Same contract shape
      // as v18: recall vs the exact cosine top-10 above a floor, with
      // exact probe/result counts gating the plumbing (measured 0.585 at
      // sf0.01, floor 0.50; SimBench's angularly-uniform corpus — the
      // worst case for sign bits — floors at 0.34).
      "v20_bq_rerank",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.filter(col("vec_id") < 20)
        val bqTop = graft.ops.Quantize.binaryRerankTopK(emb, probes,
            "vec_id", "embedding", k = 10, overfetch = overfetchFor(emb.count()))
          .select(col("query_id"), col("vec_id"))
        val exactTop = graft.ops.Similarity.bruteForceTopK(emb, probes,
            "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("vec_id"))
        val matches = bqTop.join(exactTop, Seq("query_id", "vec_id"))
        bqTop.agg(countDistinct(col("query_id")).as("n_queries"),
            count(lit(1)).as("n_results"))
          .crossJoin(matches.agg(count(lit(1)).as("n_match")))
          .select(col("n_queries"), col("n_results"),
            (col("n_match").cast("double") /
              col("n_results").cast("double") >= 0.50).as("recall_ok"))
      },
      Some("""
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(count(*) * 10 AS BIGINT) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 20
        |""".stripMargin.trim)),

    QueryDef(
      // Clustering diagnostics over the shared IVF coarse quantizer — the
      // index-health audit run after building any clustered layout
      // (IVF/SemDeDup/corpus cartography): (1) every vector's stored cell
      // is its max-cosine centroid, re-verified INDEPENDENTLY of the
      // fused CentroidArgmax assignment path by scoring all |cells|
      // centroids per vector through the CosineSimilarity expression
      // (1e-6 tolerance absorbs float-vs-double accumulation-order drift
      // between the two implementations — this is an audit of the argmax
      // DECISION, not of last-bit arithmetic); (2) mean cosine to the own
      // centroid strictly exceeds mean cosine to other centroids (the
      // clustering carries real structure). The audit scan is corpus x
      // |cells| rows against a broadcast 8-row centroid table — at 100 TB
      // the same audit runs over a deterministic hash-sample of the
      // corpus (a02's sampling pattern), cells being a fitted artifact.
      // The oracle recomputes n_points (embeddable rows) independently;
      // k-means itself is not SQL-expressible, so the geometric checks
      // are in-query contracts, a01/e02-style.
      "v21_cluster_diag",
      (s, dir) => {
        val t = Tables(s, dir)
        // Deliberately NOT law-sized (Ivf.cellsFor): n_cells here is the
        // REPORT granularity and part of the output contract (the oracle
        // pins 8), not a serving-cost knob — and the audit scan is
        // corpus x 8 regardless of corpus size (sampled at 100 TB, see
        // the scaladoc above).
        val idx = graft.ops.Ivf.buildCached(t.embeddings, "vec_id",
          "embedding", numCells = 8, iterations = 2)
        val scored = idx.cells
          .crossJoin(broadcast(idx.centroids.withColumnRenamed("cell", "ccell")))
          .withColumn("csim", cosine(col("embedding"), col("centroid")))
        val per = scored.groupBy(col("vec_id"), col("cell"))
          .agg(max(col("csim")).as("max_sim"),
            max(when(col("ccell") === col("cell"), col("csim"))).as("own_sim"),
            avg(when(col("ccell") =!= col("cell"), col("csim"))).as("other_sim"))
        per.agg(
            count(lit(1)).as("n_points"),
            (sum(when(col("own_sim") >= col("max_sim") - lit(1e-6), 1L)
              .otherwise(0L)) === count(lit(1))).as("assign_ok"),
            (avg(col("own_sim")) > avg(col("other_sim"))).as("separation_ok"))
          .select(col("n_points"), lit(8).as("n_cells"),
            col("assign_ok"), col("separation_ok"))
      },
      Some("""
        |SELECT count(*) AS n_points, 8 AS n_cells,
        |       TRUE AS assign_ok, TRUE AS separation_ok
        |FROM embeddings
        |WHERE embedding IS NOT NULL AND len(embedding) > 0
        |""".stripMargin.trim)),

    QueryDef(
      // D4 prototypicality pruning (arXiv:2308.12284) as an in-query
      // contract (k-means not being SQL-expressible, same as v21/e05):
      // drop the floor(eps*|cell|) points closest to their centroid in
      // each coarse cell. Checked: the drop count lands in the exact
      // [floor(eps*n) - n_cells, floor(eps*n)] band the per-cell floor
      // guarantees, every cell's drop count is exactly floor(eps*|cell|),
      // and the dropped points' mean centroid-cosine strictly exceeds the
      // kept points' (we removed the redundant core, not the periphery).
      "e06_d4_prune_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        val eps = 0.2
        val marked = graft.ops.Similarity.prototypicalityPrune(
          t.embeddings, "vec_id", "embedding", eps, numCells = 8)
        val perCell = marked.groupBy(col("cell"), col("cell_n"))
          .agg(sum(when(col("dropped"), 1L).otherwise(0L)).as("cell_dropped"))
          .withColumn("cell_ok",
            col("cell_dropped") === floor(col("cell_n") * eps))
        val cells_ok = perCell.agg(
          (sum(when(col("cell_ok"), 0L).otherwise(1L)) === 0L).as("per_cell_ok"))
        marked.agg(
            count(lit(1)).as("n_points"),
            sum(when(col("dropped"), 1L).otherwise(0L)).as("n_dropped_raw"),
            avg(when(col("dropped"), col("proto"))).as("drop_mean"),
            avg(when(!col("dropped"), col("proto"))).as("keep_mean"))
          .crossJoin(cells_ok)
          .select(col("n_points"),
            (col("n_dropped_raw") <= floor(col("n_points") * eps) &&
              col("n_dropped_raw") >= floor(col("n_points") * eps) - 8)
              .as("drop_frac_ok"),
            col("per_cell_ok"),
            (col("drop_mean") > col("keep_mean")).as("proto_ok"))
      },
      Some("""
        |SELECT count(*) AS n_points, TRUE AS drop_frac_ok,
        |       TRUE AS per_cell_ok, TRUE AS proto_ok
        |FROM embeddings
        |WHERE embedding IS NOT NULL AND len(embedding) > 0
        |""".stripMargin.trim)),

    QueryDef(
      // PCA whitening (Pca.whiten): decorrelate-and-rescale before
      // cosine retrieval / product quantization, where an anisotropic
      // corpus lets a few dominant directions swamp the metric. The
      // 1/sqrt(eigenvalue) scaling folds into the component matrix on
      // the driver, so whitening runs as the SAME fused map-only
      // MatVecProduct scan as e04's plain projection — zero added
      // distributed work. Contract: the whitened coordinates have
      // population identity covariance — every var_pop == 1 and every
      // off-diagonal covariance == 0 within tolerance, means == 0 —
      // checked from ONE partial+final aggregation pass (k means +
      // k vars + k(k-1)/2 cross-moments in a single one-row agg).
      // n_rows / total_var are the data-derived columns DuckDB
      // recomputes independently.
      "e07_whiten_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val k = 8
        val model = graft.ops.Pca.fit(emb, "embedding", k)
        val w = emb.select(
          graft.ops.Pca.whiten(col("embedding"), model).as("w"))
        val meanAggs = (0 until k).map(j =>
          avg(element_at(col("w"), j + 1)).as(s"m_$j"))
        val varAggs = (0 until k).map(j =>
          var_pop(element_at(col("w"), j + 1)).as(s"v_$j"))
        val crossAggs = for { a <- 0 until k; b <- a + 1 until k } yield
          avg(element_at(col("w"), a + 1) * element_at(col("w"), b + 1))
            .as(s"p_${a}_$b")
        val aggs = meanAggs ++ varAggs ++ crossAggs
        val row = w.agg(aggs.head, aggs.tail: _*).head
        val m = (0 until k).map(j => row.getDouble(j))
        val v = (0 until k).map(j => row.getDouble(k + j))
        val p = row.toSeq.drop(2 * k).map(_.asInstanceOf[Double])
        val pairs = for { a <- 0 until k; b <- a + 1 until k } yield (a, b)
        val meanOk = m.forall(x => math.abs(x) <= 1e-6)
        val varOk = v.forall(x => math.abs(x - 1.0) <= 1e-4)
        val covOk = pairs.zip(p).forall { case ((a, b), pab) =>
          math.abs(pab - m(a) * m(b)) <= 1e-4 }
        val nRows = emb.count()
        val totalVar = emb
          .select(posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i")).agg(var_pop(col("x").cast("double")).as("v"))
          .agg(sum(col("v"))).head.getDouble(0)
        s.range(1).select(lit(nRows).as("n_rows"),
          round(lit(totalVar), 4).as("total_var"),
          lit(meanOk).as("mean_ok"), lit(varOk).as("var_ok"),
          lit(covOk).as("cov_ok"))
      },
      Some("""
        |WITH el AS (
        |  SELECT generate_subscripts(embedding, 1) AS i,
        |         unnest(embedding) AS x
        |  FROM embeddings
        |),
        |pv AS (SELECT i, var_pop(CAST(x AS DOUBLE)) AS v FROM el GROUP BY i)
        |SELECT (SELECT count(*) FROM embeddings) AS n_rows,
        |       round(sum(v), 4) AS total_var,
        |       TRUE AS mean_ok, TRUE AS var_ok, TRUE AS cov_ok
        |FROM pv
        |""".stripMargin.trim)),

    QueryDef(
      // Semantic decontamination: the embedding-space tier of benchmark
      // leak detection (t09 is the n-gram tier — paraphrased leakage
      // shares no 13-gram but still sits next to the benchmark in
      // embedding space). Probes = the vec_id < 30 slice standing in for
      // a benchmark; the corpus re-ingests those probes lightly edited
      // (first 8 dims zeroed, shifted ids) the way a contaminated crawl
      // carries paraphrases. Exact broadcast-probe cosine — map-only
      // over the corpus, no shuffle before the tiny hit ranking; the
      // same verify step LSH-routed probes would feed at larger probe
      // counts.
      "e08_semantic_decon",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = t.embeddings.select(col("vec_id"), col("embedding"))
        val probes = base.filter(col("vec_id") < 30)
        val planted = probes
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 8, lit(0.0f)).otherwise(x)).as("embedding"))
        val corpus = base.filter(col("vec_id") >= 30).unionByName(planted)
        graft.ops.Similarity.semanticDecontaminate(corpus, probes,
            "vec_id", "embedding", threshold = 0.8)
          .orderBy(col("vec_id"))
      },
      Some("""
        |WITH probes AS (
        |  SELECT vec_id AS probe_id, embedding AS pv
        |  FROM embeddings WHERE vec_id < 30
        |),
        |corpus AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 30
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id,
        |         list_transform(embedding,
        |           (x, i) -> CASE WHEN i <= 8 THEN CAST(0 AS FLOAT) ELSE x END)
        |           AS embedding
        |  FROM embeddings WHERE vec_id < 30
        |),
        |hits AS (
        |  SELECT c.vec_id, p.probe_id,
        |         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                      CAST(p.pv AS DOUBLE[])), 6)
        |           AS sim
        |  FROM corpus c, probes p
        |  WHERE round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                                     CAST(p.pv AS DOUBLE[])), 6)
        |        >= 0.8
        |)
        |SELECT vec_id, probe_id, sim
        |FROM hits
        |QUALIFY row_number() OVER (PARTITION BY vec_id
        |                           ORDER BY sim DESC, probe_id) = 1
        |ORDER BY vec_id
        |""".stripMargin.trim)),

    QueryDef(
      // Greedy k-center coreset selection (Gonzalez '85 farthest-point
      // traversal; Sener & Savarese ICLR'18 use exactly this for
      // diversity-maximizing active-learning batches): pick 8 maximally
      // spread embeddings. The selection trajectory is fully deterministic
      // (rounded-at-6 cosine distances, min-id tiebreaks), so the DuckDB
      // oracle replays the greedy loop step for step and every column
      // hash-matches. Contract columns: the greedy invariant — selected
      // centers are pairwise at least the final coverage radius apart
      // (separation >= radius, the property behind the 2-approximation) —
      // plus the monotone non-increasing sel_d sequence the driver hashes
      // (the seed pins sel_d = 2.0, the cosine-distance maximum).
      // Scale: k map-only scans with broadcast-literal centers, driver
      // traffic k rows + k*d floats (see Similarity.kcenterSelect).
      "e09_kcenter_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        val sel = graft.ops.Similarity.kcenterSelect(t.embeddings,
          "vec_id", "embedding", k = 8)
        val vecs = t.embeddings.select(col("vec_id").cast("long").as("id"),
          col("embedding").as("v"))
        val a = sel.select(col("id")).join(vecs, "id")
          .select(col("id").as("ia"), col("v").as("va"))
        val b = sel.select(col("id")).join(vecs, "id")
          .select(col("id").as("ib"), col("v").as("vb"))
        val sep = a.crossJoin(b).filter(col("ia") < col("ib"))
          .agg(min(round(lit(1.0) -
            graft.functions.vector.cosine(col("va"), col("vb")), 6))
            .as("separation"))
        sel.crossJoin(broadcast(sep))
          .select(col("sel_rank"), col("id").as("vec_id"), col("sel_d"),
            col("radius"), col("separation"),
            (col("separation") >= col("radius")).as("sep_ok"))
          .orderBy(col("sel_rank"))
      },
      Some(kcenterOracle(8))),

    QueryDef(
      // Johnson–Lindenstrauss random projection (Achlioptas '03 ±1
      // entries): the DATA-INDEPENDENT dimensionality reduction — no fit
      // pass, no model state, the projection matrix is derived from a
      // seed, so at 100 TB it is one map-only MatVecProduct scan with
      // nothing collected and nothing broadcast but k x d doubles. The
      // complement to PCA (e04/e07): ingest-time sketching when a
      // covariance pass is not affordable or the corpus is unbounded
      // (streams). Contract: squared-distance preservation — over all
      // 496 pairs of the first 32 embeddings, the projected/original
      // distance ratio has mean ~1 and bounded spread (deterministic:
      // fixed seed, fixed parquet; k=32 puts the JL distortion std at
      // sqrt(2/k) = 0.25 — measured mean 0.97/1.02 and range
      // [0.40, 1.87] across the gate scales, well inside the checked
      // band). n_rows is the data-derived column DuckDB recomputes.
      "v24_jl_contract",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 32
        val d = 64
        def mix(x0: Long): Long = {
          var x = x0 + 0x9e3779b97f4a7c15L
          x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
          x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
          x ^ (x >>> 31)
        }
        val inv = 1.0 / math.sqrt(k.toDouble)
        val mat = Array.tabulate(k, d)((r, c) =>
          if ((mix(42L << 20 | (r * d + c).toLong) & 1L) == 0L) inv else -inv)
        val sub = t.embeddings.filter(col("vec_id") < 32)
          .select(col("vec_id"), col("embedding"),
            graft.functions.MatVecProduct(col("embedding"), mat,
              Array.fill(k)(0.0)).as("proj"))
        def dist2(x: org.apache.spark.sql.Column,
            y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          aggregate(zip_with(x, y,
            (p, q) => (p.cast("double") - q.cast("double")) *
              (p.cast("double") - q.cast("double"))),
            lit(0.0), (acc, v) => acc + v)
        val a = sub.select(col("vec_id").as("ida"),
          col("embedding").as("ea"), col("proj").as("pa"))
        val b = sub.select(col("vec_id").as("idb"),
          col("embedding").as("eb"), col("proj").as("pb"))
        val stats = a.join(b, col("ida") < col("idb"))
          .select((dist2(col("pa"), col("pb")) /
            dist2(col("ea"), col("eb"))).as("ratio"))
          .agg(count(lit(1)).as("n_pairs_raw"), avg(col("ratio")).as("m"),
            min(col("ratio")).as("lo"), max(col("ratio")).as("hi"))
        val nRows = t.embeddings.count()
        stats.select(lit(nRows).as("n_rows"),
          col("n_pairs_raw").as("n_pairs"),
          (col("m") >= 0.9 && col("m") <= 1.1).as("mean_ok"),
          (col("lo") > 0.25 && col("hi") < 2.5).as("range_ok"))
      },
      Some("""
        |SELECT (SELECT count(*) FROM embeddings) AS n_rows,
        |       CAST(496 AS BIGINT) AS n_pairs,
        |       TRUE AS mean_ok, TRUE AS range_ok
        |""".stripMargin.trim)),

    QueryDef(
      // IVF serving diagnostic: the recall-vs-cost curve over nprobe —
      // the knob an operator turns when an ANN index misses. Routed cell
      // sets are NESTED as nprobe grows (rank by centroid cosine, cell
      // tiebreak), and a true top-k member present in a candidate set
      // always survives that set's top-k, so recall against the
      // full-probe baseline is PROVABLY non-decreasing — checked per
      // step (mono_ok), with full probe recovering the baseline exactly
      // (full_ok; v11 separately certifies full probe == brute force).
      // Rides v09's cached index; each sweep scans only its routed cells.
      "v22_nprobe_sweep",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.orderBy(col("vec_id")).limit(10)
        // Sweep points track the sizing laws: 1 / the law's serving
        // nprobe / full probe. The sweep values are OUTPUT columns, so
        // the oracle recomputes cellsFor/nprobeFor in SQL from count(*)
        // (integer pow2 ceiling via a powers table — no FP log2) and the
        // gate corpus still reads (1, 4, 16).
        val cells = graft.ops.Ivf.cellsFor(emb.count())
        val idx = graft.ops.Ivf.buildCached(emb, "vec_id", "embedding",
          numCells = cells, iterations = 1)
        val full = graft.ops.Ivf.search(idx, probes, "vec_id", "embedding",
            k = 5, nprobe = cells)
          .select(col("query_id").as("fq"), col("vec_id").as("fv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sweep = Seq(1, graft.ops.Ivf.nprobeFor(cells, 16, 4), cells)
          .distinct.map { np =>
          graft.ops.Ivf.search(idx, probes, "vec_id", "embedding",
              k = 5, nprobe = np)
            .join(full, col("query_id") === col("fq") &&
              col("vec_id") === col("fv"), "left")
            .agg(count(col("fv")).as("hits"), count(lit(1)).as("n_ret"))
            .select(lit(np).as("nprobe"), col("hits"), col("n_ret"))
        }.reduce(_ unionByName _)
        val byNp = Window.orderBy(col("nprobe"))
        sweep
          .withColumn("prev_hits", lag(col("hits"), 1).over(byNp))
          .select(col("nprobe"),
            (col("prev_hits").isNull || col("hits") >= col("prev_hits"))
              .as("mono_ok"),
            (col("nprobe") < cells || col("hits") === col("n_ret"))
              .as("full_ok"))
          .orderBy(col("nprobe"))
      },
      Some("""
        |WITH up AS (
        |  SELECT CAST(CEIL(SQRT(count(*) / 2.0)) AS BIGINT) AS u
        |  FROM embeddings
        |),
        |cells AS (
        |  SELECT LEAST(4096, MIN(CAST(POWER(2, g.g) AS BIGINT))) AS c
        |  FROM range(0, 31) g(g), up
        |  WHERE CAST(POWER(2, g.g) AS BIGINT) >= up.u
        |),
        |sweep AS (
        |  -- mid point = nprobeFor's integer 2/3-power law: smallest p
        |  -- with p^3 >= 4^3 * c^2 / 16^2 (no FP pow — exact-cube
        |  -- boundaries land exactly on pow2 geometries)
        |  SELECT DISTINCT nprobe FROM (
        |    SELECT 1 AS nprobe
        |    UNION ALL
        |    SELECT CAST(LEAST(cl.c, GREATEST(4,
        |      (SELECT MIN(p) FROM range(1, 4097) t(p)
        |       WHERE p * p * p >= 64 * cl.c * cl.c // 256))) AS INTEGER)
        |    FROM cells cl
        |    UNION ALL
        |    SELECT CAST(c AS INTEGER) FROM cells) s
        |)
        |SELECT CAST(nprobe AS INTEGER) AS nprobe,
        |       TRUE AS mono_ok, TRUE AS full_ok
        |FROM sweep
        |ORDER BY nprobe
        |""".stripMargin.trim)),

    QueryDef(
      // Incremental index maintenance: build on 90% of the corpus, add
      // the remaining 10% via Ivf.extend (route-to-existing-centroids,
      // no re-clustering — FAISS's `add`, the daily-ingest path of a
      // served index). Full-probe search over the EXTENDED index must
      // equal brute force over the UNION corpus — the contract that holds
      // however stale the centroids are: staleness costs recall at small
      // nprobe, never correctness of the routed scan. Oracle is v11's
      // whole-corpus brute force.
      "v23_ivf_extend",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.orderBy(col("vec_id")).limit(20)
        val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
        val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
        // Sized to the BASE corpus (what the build sees; extend never
        // re-clusters) and probed in full, so the brute-force oracle
        // holds for any cell count the law picks.
        val cells = graft.ops.Ivf.cellsFor(base.count())
        val idx = graft.ops.Ivf.build(base, "vec_id", "embedding",
          numCells = cells, iterations = 1)
        val extended = graft.ops.Ivf.extend(idx, batch, "vec_id", "embedding")
        graft.ops.Ivf.search(extended, probes, "vec_id", "embedding",
            k = 5, nprobe = cells)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some("""
        |WITH probes AS (
        |  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 20
        |),
        |sims AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])), 6) AS sim
        |  FROM embeddings e, probes q
        |  WHERE e.vec_id <> q.vec_id
        |),
        |ranked AS (
        |  SELECT query_id, vec_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |)
        |SELECT query_id, rnk, vec_id, sim
        |FROM ranked WHERE rnk <= 5
        |ORDER BY query_id, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // Matryoshka-style prefix-dimension retrieval eval (Kusupati et al.,
      // arXiv:2205.13147): rank by cosine over only the FIRST d dims —
      // the 8x/4x/2x storage-and-FLOPs serving cut MRL-trained embedders
      // enable — and measure recall@10 against the full-dim ranking. The
      // query one runs before truncating a 100 TB embedding store. Each
      // arm is the map-only broadcast-probe scan (10 probes x corpus,
      // prefix slice inside the codegen'd cosine); ranking is by ROUNDED
      // sim + vec_id tiebreak on both engines so order never drifts. The
      // d=64 row is the built-in sanity check (recall 1.0 by identity);
      // avg_recall is exact integer hits/100 — deterministic, not a
      // tolerance contract.
      "v25_matryoshka",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = broadcast(emb.orderBy(col("vec_id")).limit(10)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")))
        def topk(d: Int) = {
          val sims = emb.crossJoin(probes)
            .filter(col("vec_id") =!= col("qid"))
            .select(col("qid"), col("vec_id"),
              round(cosineSub(col("embedding"), col("qv"), d), 6).as("sim"))
          val w = Window.partitionBy(col("qid"))
            .orderBy(col("sim").desc, col("vec_id"))
          sims.withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= 10)
            .select(col("qid"), col("vec_id"))
        }
        // Persist the UNRENAMED full-dim ranking: the d=64 arm's bare
        // topk(64) subtree then matches this cache entry (a rename
        // Project on top of the persist would make the arm re-run the
        // whole corpus scan — CacheManager keys on the exact plan).
        val base64 = topk(64)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val full = base64.select(col("qid").as("fq"), col("vec_id").as("fv"))
        Seq(8, 16, 32, 64).map { d =>
          topk(d)
            .join(full, col("qid") === col("fq") &&
              col("vec_id") === col("fv"), "left")
            .agg(count(col("fv")).as("hits"), count(lit(1)).as("n_ret"))
            .select(lit(d).as("prefix_dim"),
              round(col("hits").cast("double") /
                col("n_ret").cast("double"), 4).as("avg_recall"))
        }.reduce(_ unionByName _)
          .orderBy(col("prefix_dim"))
      },
      Some("""
        |WITH probes AS (
        |  SELECT vec_id AS qid, embedding AS qv
        |  FROM embeddings ORDER BY vec_id LIMIT 10
        |),
        |cfg AS (SELECT d FROM (VALUES (8), (16), (32), (64)) t(d)),
        |sims AS (
        |  SELECT c.d, q.qid, e.vec_id,
        |         round(list_cosine_similarity(
        |           CAST(e.embedding[1:c.d] AS DOUBLE[]),
        |           CAST(q.qv[1:c.d] AS DOUBLE[])), 6) AS sim
        |  FROM embeddings e, probes q, cfg c
        |  WHERE e.vec_id <> q.qid
        |),
        |ranked AS (
        |  SELECT d, qid, vec_id,
        |         row_number() OVER (PARTITION BY d, qid
        |                            ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |),
        |top AS (SELECT d, qid, vec_id FROM ranked WHERE rnk <= 10),
        |full_top AS (SELECT qid, vec_id FROM top WHERE d = 64)
        |SELECT t.d AS prefix_dim,
        |       round(CAST(count(f.vec_id) AS DOUBLE) / count(*), 4)
        |         AS avg_recall
        |FROM top t
        |LEFT JOIN full_top f ON f.qid = t.qid AND f.vec_id = t.vec_id
        |GROUP BY t.d
        |ORDER BY prefix_dim
        |""".stripMargin.trim)),

    QueryDef(
      // Contrastive training-pair mining: per anchor, the nearest
      // SAME-label vector (the positive) and the 3 nearest DIFFERENT-label
      // vectors (hard negatives — close in embedding space, wrong class;
      // the triplet/InfoNCE batch construction of Schroff et al. 2015 /
      // SimCLR). One broadcast-anchor scan scores the corpus map-only,
      // then one (anchor, same)-partitioned top-k window emits <= 4 rows
      // per anchor — at 100 TB the scan is the whole cost and the LSH/IVF
      // routes (e02, v09) slot in as the candidate front exactly as in
      // e08's decon.
      "e10_hard_negatives",
      (s, dir) => {
        val t = Tables(s, dir)
        val anchors = broadcast(
          t.embeddings.filter(col("vec_id") < 8)
            .select(col("vec_id").as("anchor_id"),
              col("embedding").as("a_emb"), col("label").as("a_label")))
        val w = Window.partitionBy(col("anchor_id"), col("same"))
          .orderBy(col("sim").desc, col("vec_id"))
        t.embeddings.crossJoin(anchors)
          .filter(col("vec_id") =!= col("anchor_id"))
          .withColumn("same", col("label") === col("a_label"))
          .withColumn("sim",
            round(cosine(col("embedding"), col("a_emb")), 6))
          .withColumn("rnk", row_number().over(w))
          .filter((col("same") && col("rnk") <= 1) ||
            (!col("same") && col("rnk") <= 3))
          .select(col("anchor_id"),
            when(col("same"), "positive").otherwise("hard_negative").as("role"),
            col("rnk"), col("vec_id"), col("sim"), col("label"))
          .orderBy(col("anchor_id"), col("role"), col("rnk"))
      },
      Some("""
        |WITH anchors AS (
        |  SELECT vec_id AS anchor_id, embedding AS a_emb, label AS a_label
        |  FROM embeddings WHERE vec_id < 8
        |),
        |sims AS (
        |  SELECT a.anchor_id, e.vec_id, e.label,
        |         (e.label = a.a_label) AS same,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(a.a_emb AS DOUBLE[])), 6) AS sim
        |  FROM embeddings e, anchors a WHERE e.vec_id <> a.anchor_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY anchor_id, same
        |                               ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |)
        |SELECT anchor_id,
        |       CASE WHEN same THEN 'positive' ELSE 'hard_negative' END AS role,
        |       rnk, vec_id, sim, label
        |FROM ranked WHERE (same AND rnk <= 1) OR (NOT same AND rnk <= 3)
        |ORDER BY anchor_id, role, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // Filtered (hybrid) vector search — "nearest neighbors WHERE
      // label = 3", the metadata-constrained ANN query every production
      // vector store serves. In-scan filtering over ONE shared index
      // (the same cached IVF index v09/v11 use — the cells relation
      // keeps every corpus column, so the predicate prunes inside the
      // routed scan before scoring), versus the two naive spellings:
      // post-filtering top-k loses results when matches are sparse, and
      // pre-filter-then-brute pays a full scan per predicate. Full probe
      // makes the filtered search EXACT over the filtered corpus (v11's
      // rule), which is what lets the brute-force oracle hash-match;
      // pruned-nprobe recall behavior is pinned in IvfSpec.
      "v26_filtered_ann",
      (s, dir) => {
        val t = Tables(s, dir)
        val emb = t.embeddings
        val probes = emb.orderBy(col("vec_id")).limit(10)
        // Shares v09/v11's law-sized cached index; full probe keeps the
        // filtered search exact over the filtered corpus for any cells.
        val cells = graft.ops.Ivf.cellsFor(emb.count())
        val idx = graft.ops.Ivf.buildCached(emb, "vec_id", "embedding",
          numCells = cells, iterations = 1)
        graft.ops.Ivf.searchFiltered(idx, col("label") === 3,
            probes, "vec_id", "embedding", k = 5, nprobe = cells)
          .orderBy(col("query_id"), col("rnk"))
      },
      Some("""
        |WITH probes AS (
        |  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 10
        |),
        |sims AS (
        |  SELECT q.vec_id AS query_id, e.vec_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(q.embedding AS DOUBLE[])), 6) AS sim
        |  FROM embeddings e, probes q
        |  WHERE e.vec_id <> q.vec_id AND e.label = 3
        |),
        |ranked AS (
        |  SELECT query_id, vec_id, sim,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, vec_id) AS rnk
        |  FROM sims
        |)
        |SELECT query_id, rnk, vec_id, sim
        |FROM ranked WHERE rnk <= 5
        |ORDER BY query_id, rnk
        |""".stripMargin.trim)),

    QueryDef(
      // Embedding-corpus QA audit — the gate an indexing pipeline runs
      // BEFORE building ANN structures over a new embedding drop: ragged
      // dimensions, zero vectors (cosine-undefined), non-finite elements
      // (NaN poisons every dot product downstream), exact byte-dup
      // vectors (re-embedded content), and the norm envelope (a
      // collapsed or exploding norm distribution is the classic sign of
      // an encoder regression). ONE map-side scan — magnitude and the
      // finiteness fold are per-row expressions — feeding a single
      // global aggregate; at 100 TB the exchange carries one partial-agg
      // row per partition. Norm stats round at 6 (v03's magnitude rule);
      // counts are exact integers.
      "e11_embed_audit",
      (s, dir) =>
        graft.ops.Similarity.embedAudit(Tables(s, dir).embeddings,
          "embedding"),
      Some("""
        |WITH scanned AS (
        |  SELECT vec_id, embedding, len(embedding) AS dims,
        |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                               CAST(embedding AS DOUBLE[]))) AS nrm,
        |         list_bool_or(list_transform(embedding,
        |           x -> isnan(x) OR isinf(x))) AS nonfinite
        |  FROM embeddings
        |)
        |SELECT count(*) AS n_vecs,
        |       min(dims) AS dims_min, max(dims) AS dims_max,
        |       CAST(sum(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_zero,
        |       CAST(sum(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_nonfinite,
        |       count(*) - count(DISTINCT embedding) AS n_exact_dups,
        |       round(min(nrm), 6) AS norm_min,
        |       round(avg(nrm), 6) AS norm_mean,
        |       round(max(nrm), 6) AS norm_max
        |FROM scanned
        |""".stripMargin.trim)),

    QueryDef(
      // Bitext-style margin mining (Artetxe & Schwenk, ACL'19 §3.2 — the
      // LASER/CCMatrix alignment criterion): score candidate pairs across
      // two embedding pools by RATIO margin — cosine divided by the mean
      // of the two sides' k-NN cosines — which cancels hubness: a vector
      // "close to everything" inflates its own neighborhood mean and is
      // discounted, where a raw-cosine threshold floods the output with
      // its pairs. Pools here are label 0 vs label 1 (two "languages").
      //
      // Determinism / engine parity: cosines become exact integer
      // micro-units BEFORE any aggregation, so the k-NN neighborhood
      // sums are exact integer math (a top-k SUM is tie-invariant even
      // though row_number ties are not) and the margin is ONE double
      // division of two exact integers — bit-identical on any engine
      // that agrees on rounded cosines (v02's proven contract).
      //
      // Scale shape: the candidate front here is the exact cross of two
      // label pools, which is what makes a brute-force oracle possible;
      // at 100 TB the LSH/IVF fronts (e02, v09) replace it exactly as in
      // e08's decontamination, and both neighborhood means ride the SAME
      // candidate relation — persisted once for its three consumers
      // (kx, ky, final join), the t12 multi-consumer lesson.
      "e12_margin_mining",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 4
        // both sides bounded at ExactArmCap: the exact kNN-margin relation
        // is certification apparatus, SF-independent work by design
        val capped = t.embeddings.filter(
          col("vec_id") < graft.ops.Similarity.ExactArmCap)
        val src = capped.filter(col("label") === 0)
          .select(col("vec_id").as("src_id"), col("embedding").as("src_emb"))
        val tgt = capped.filter(col("label") === 1)
          .select(col("vec_id").as("tgt_id"), col("embedding").as("tgt_emb"))
        val pairs = src.crossJoin(tgt)
          .select(col("src_id"), col("tgt_id"),
            round(cosine(col("src_emb"), col("tgt_emb")) * 1e6)
              .cast("long").as("scaled"))
          .persist()
        val kx = pairs
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("src_id")).orderBy(
              col("scaled").desc, col("tgt_id"))))
          .filter(col("rk") <= k)
          .groupBy(col("src_id")).agg(sum(col("scaled")).as("kx"))
        val ky = pairs
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("tgt_id")).orderBy(
              col("scaled").desc, col("src_id"))))
          .filter(col("rk") <= k)
          .groupBy(col("tgt_id")).agg(sum(col("scaled")).as("ky"))
        pairs.join(kx, "src_id").join(ky, "tgt_id")
          .select(col("src_id"), col("tgt_id"),
            round(col("scaled") / 1e6, 6).as("sim"),
            round((col("scaled") * lit(2L * k)).cast("double") /
              (col("kx") + col("ky")).cast("double"), 6).as("margin"))
          .orderBy(col("margin").desc, col("src_id"), col("tgt_id"))
          .limit(20)
      },
      Some("""
        |WITH src AS (
        |  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS src_emb
        |  FROM embeddings WHERE label = 0 AND vec_id < 4000
        |),
        |tgt AS (
        |  SELECT vec_id AS tgt_id, CAST(embedding AS DOUBLE[]) AS tgt_emb
        |  FROM embeddings WHERE label = 1 AND vec_id < 4000
        |),
        |pairs AS (
        |  SELECT src_id, tgt_id,
        |         CAST(round(list_cosine_similarity(src_emb, tgt_emb) * 1e6)
        |              AS BIGINT) AS scaled
        |  FROM src, tgt
        |),
        |kx AS (
        |  SELECT src_id, sum(scaled) AS kx FROM (
        |    SELECT src_id, scaled,
        |           row_number() OVER (PARTITION BY src_id
        |                              ORDER BY scaled DESC, tgt_id) AS rk
        |    FROM pairs) WHERE rk <= 4 GROUP BY src_id
        |),
        |ky AS (
        |  SELECT tgt_id, sum(scaled) AS ky FROM (
        |    SELECT tgt_id, scaled,
        |           row_number() OVER (PARTITION BY tgt_id
        |                              ORDER BY scaled DESC, src_id) AS rk
        |    FROM pairs) WHERE rk <= 4 GROUP BY tgt_id
        |)
        |SELECT p.src_id, p.tgt_id,
        |       round(p.scaled / 1e6, 6) AS sim,
        |       round(CAST(p.scaled * 8 AS DOUBLE)
        |             / CAST(kx.kx + ky.ky AS DOUBLE), 6) AS margin
        |FROM pairs p
        |JOIN kx ON kx.src_id = p.src_id
        |JOIN ky ON ky.tgt_id = p.tgt_id
        |ORDER BY margin DESC, p.src_id, p.tgt_id
        |LIMIT 20
        |""".stripMargin.trim)),

    QueryDef(
      // The installed OPTIMIZER RULE driven end-to-end: ApproxCosineJoinRule
      // rewrites an all-pairs cosine-threshold cross join into a sign-LSH
      // bucket join with exact re-verification. The query plants exact
      // doubles (every 10th vector copied under -vec_id-1, v06's pattern in
      // t33's negative-id convention) and filters at 0.95 — above every
      // non-identical pair in any fixture (sf0.1 max natural 0.60; the sf1
      // fixture's hash-seeded copies contain a 0.9013 natural pair, which
      // the sf1 replay caught the LSH legitimately missing at the old 0.9
      // threshold, plus two seed-collision EXACT duplicates at 1.0 that
      // belong in the relation and always collide) — so the qualifying set
      // is exactly the identical-vector pairs.
      // Identical vectors have identical sign signatures in every band, so
      // the LSH rewrite is structurally recall-complete here and the pair
      // relation is deterministic: the oracle replays the exact all-pairs
      // predicate and must hash-match. The `rewritten` column pins the plan
      // shape (marker columns injected, no cartesian/BNLJ in the physical
      // plan): if the rule silently stops firing, the flag flips false and
      // the driver flags the hash. The rule conf is scoped try/finally so
      // the approximation CANNOT leak into other queries' plans; results
      // are collected under the rewritten plan inside the scope (a
      // Dataset's QueryExecution is cached, so the forced plans are the
      // executed ones).
      "e13_approx_join_rule",
      (s, dir) => {
        import graft.plans.ApproxCosineJoinRule
        val t = Tables(s, dir)
        ApproxCosineJoinRule.install(s)
        s.conf.set(ApproxCosineJoinRule.EnabledKey, "true")
        // Size bits-per-band for the corpus (the rule's sizing law): the
        // default 2-bit bands saturate past a few hundred rows and the
        // bucket join degenerates toward the cross join it replaced
        // (measured 66.8 s at 2.2k vectors). 16-bit bands keep bucket
        // occupancy << 1 up to ~10^5 rows; exact twins still collide in
        // every band, so the planted recall stays structurally complete.
        s.conf.set(ApproxCosineJoinRule.PlanesKey, "64")
        s.conf.set(ApproxCosineJoinRule.BandsKey, "4")
        try {
          // bounded at ExactArmCap like the other exact contract arms
          val base = t.embeddings
            .filter(col("vec_id") < graft.ops.Similarity.ExactArmCap)
            .select(col("vec_id"), col("embedding"))
          val planted = base.filter(col("vec_id") % 10 === 0)
            .select((-col("vec_id") - 1L).as("vec_id"), col("embedding"))
          val all = base.unionByName(planted)
          val a = all.select(col("vec_id").as("id_a"),
            col("embedding").as("vec_a"))
          val b = all.select(col("vec_id").as("id_b"),
            col("embedding").as("vec_b"))
          val pairs = a.crossJoin(b)
            .filter(col("id_a") < col("id_b") &&
              graft.functions.vector.cosine(col("vec_a"), col("vec_b")) >= 0.95)
            .select(col("id_a"), col("id_b"),
              round(graft.functions.vector.cosine(col("vec_a"), col("vec_b")),
                6).as("sim"))
          val opt = pairs.queryExecution.optimizedPlan.toString
          val phys = pairs.queryExecution.executedPlan.toString
          val rewritten = opt.contains("__graft_") &&
            !phys.contains("CartesianProduct") &&
            !phys.contains("BroadcastNestedLoop")
          val found = pairs.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getDouble(2), rewritten)).toSeq
          import s.implicits._
          found.toDF("id_a", "id_b", "sim", "rewritten")
            .orderBy(col("id_a"), col("id_b"))
        } finally {
          s.conf.set(ApproxCosineJoinRule.EnabledKey, "false")
          s.conf.unset(ApproxCosineJoinRule.PlanesKey)
          s.conf.unset(ApproxCosineJoinRule.BandsKey)
        }
      },
      Some("""
        |WITH planted AS (
        |  SELECT -vec_id - 1 AS vec_id, embedding
        |  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 4000
        |),
        |all_v AS (
        |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4000
        |  UNION ALL SELECT vec_id, embedding FROM planted
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6)
        |         AS sim,
        |       TRUE AS rewritten
        |FROM all_v a, all_v b
        |WHERE a.vec_id < b.vec_id
        |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.95
        |ORDER BY id_a, id_b
        |""".stripMargin.trim)),

    QueryDef(
      // Embedding snapshot drift — the encoder-regression alarm between
      // two embedding drops (here: even vs odd vec_id halves standing in
      // for "previous run" vs "re-embedded"): per label, the cosine
      // DRIFT between the two halves' centroids. A healthy re-embedding
      // drifts ~0; a changed encoder (or a silently shuffled label
      // column) shows up as per-label centroid rotation long before
      // downstream eval moves. Centroid components are avg-at-6 (v08's
      // proven centroid contract); the cosine folds 64 rounded values,
      // so round-6 output absorbs fold-order drift by 9 orders of
      // magnitude. One posexplode aggregation — the (label, side, dim)
      // relation is bounded by |labels|x2x64 whatever the corpus size.
      "v27_centroid_drift",
      (s, dir) => {
        val t = Tables(s, dir)
        val comp = t.embeddings
          .select(col("label"), (col("vec_id") % 2 === 0).as("old_side"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy(col("label"), col("old_side"), col("dim"))
          .agg(round(avg(col("x").cast("double")), 6).as("c"))
        val o = comp.filter(col("old_side"))
          .select(col("label"), col("dim"), col("c").as("co"))
        val n = comp.filter(!col("old_side"))
          .select(col("label"), col("dim"), col("c").as("cn"))
        val drift = o.join(n, Seq("label", "dim"))
          .groupBy(col("label"))
          .agg(round(lit(1.0) - sum(col("co") * col("cn")) /
            sqrt(sum(col("co") * col("co")) * sum(col("cn") * col("cn"))), 6)
            .as("drift"))
        t.embeddings.groupBy(col("label"))
          .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L))
            .as("n_old"),
            sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_new"))
          .join(drift, Seq("label"))
          .select(col("label"), col("n_old"), col("n_new"), col("drift"))
          .orderBy(col("label"))
      },
      Some("""
        |WITH comp AS (
        |  SELECT label, (vec_id % 2 = 0) AS old_side, d.d AS dim,
        |         round(avg(CAST(embedding[CAST(d.d AS INTEGER) + 1] AS DOUBLE)), 6)
        |           AS c
        |  FROM embeddings, range(64) d(d)
        |  GROUP BY 1, 2, 3
        |),
        |j AS (
        |  SELECT o.label, o.c AS co, n.c AS cn
        |  FROM comp o JOIN comp n ON o.label = n.label AND o.dim = n.dim
        |  WHERE o.old_side AND NOT n.old_side
        |),
        |drift AS (
        |  SELECT label,
        |         round(1.0 - sum(co*cn) / sqrt(sum(co*co) * sum(cn*cn)), 6)
        |           AS drift
        |  FROM j GROUP BY label
        |),
        |counts AS (
        |  SELECT label,
        |         CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_old,
        |         CAST(sum(CASE WHEN vec_id % 2 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_new
        |  FROM embeddings GROUP BY label
        |)
        |SELECT c.label, c.n_old, c.n_new, d.drift
        |FROM counts c JOIN drift d ON d.label = c.label
        |ORDER BY c.label
        |""".stripMargin.trim)),

    QueryDef(
      // Mutual (reciprocal) k-NN pairs — a is in b's top-k AND b is in
      // a's top-k. The hubness-robust matching primitive: one-directional
      // kNN links every point to hubs; requiring reciprocity keeps only
      // genuinely mutual affinity (the criterion behind reciprocal-rank
      // bitext filtering and RNN-DBSCAN-style clustering; e12's margin
      // is the soft version, this is the hard one). ONE kNN relation
      // (rounded sims + id tiebreaks BEFORE ranking — the v02 engine-
      // parity contract), self-joined on reversed endpoints, canonical
      // a < b orientation. The exact all-pairs front is the oracle-able
      // gate form; at 100 TB the IVF/LSH candidate fronts (v09/e02)
      // produce the same relation per-probe, and the reciprocity join is
      // k-bounded per vertex regardless of corpus size.
      "v28_mutual_knn",
      (s, dir) => {
        val t = Tables(s, dir)
        // The exact kNN front, FUSED: the whole corpus scores against its
        // own (bounded, driver-collected) probe matrix inside one map-only
        // expression — no cross join, no top-k aggregation, no shuffle
        // before the reciprocity join. Output-identical to the
        // bruteForceTopK broadcast-join form (same cosine pass, rounding
        // before ranking, id tiebreaks); ~4x faster at this shape because
        // 4M candidate ROWS no longer flow through join + aggregate
        // machinery for 0.26 GFLOP of arithmetic. mutualKnn composes over
        // ANY (query_id, rnk, vec_id, sim) relation, so an IVF front
        // (v09's index) drops in unchanged when approximate recall is
        // acceptable; this exact front IS the oracle-able gate form.
        // both sides bounded at ExactArmCap: the exact kNN front is the
        // oracle-able gate form, SF-independent work by design
        val capped = t.embeddings.filter(
          col("vec_id") < graft.ops.Similarity.ExactArmCap)
        val knn = graft.ops.Similarity.bruteForceTopKFused(
          capped, capped, "vec_id", "embedding", k = 5)
          .persist()
        graft.ops.Similarity.mutualKnn(knn)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""
        |WITH sims AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb,
        |         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                      CAST(b.embedding AS DOUBLE[])), 6)
        |           AS sim
        |  FROM embeddings a, embeddings b
        |  WHERE a.vec_id <> b.vec_id
        |    AND a.vec_id < 4000 AND b.vec_id < 4000
        |),
        |knn AS (
        |  SELECT ida, idb, sim,
        |         row_number() OVER (PARTITION BY ida
        |                            ORDER BY sim DESC, idb) AS rnk
        |  FROM sims
        |  QUALIFY rnk <= 5
        |)
        |SELECT x.ida AS id_a, x.idb AS id_b, x.sim,
        |       x.rnk AS rnk_ab, y.rnk AS rnk_ba
        |FROM knn x JOIN knn y ON x.ida = y.idb AND x.idb = y.ida
        |WHERE x.ida < x.idb
        |ORDER BY id_a, id_b
        |""".stripMargin.trim))
  )

  /** e09's oracle: the greedy farthest-point loop unrolled to k steps.
    * MATERIALIZED CTEs are load-bearing — DuckDB inlines CTEs by default,
    * and since step i references step i-1 twice (argmax + min-fold) the
    * inlined plan is 2^k cosine chains.
    */
  private def kcenterOracle(k: Int): String = {
    val head = """
      |WITH emb AS (
      |  SELECT CAST(vec_id AS BIGINT) AS id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings
      |),
      |c1 AS MATERIALIZED (SELECT min(id) AS id FROM emb),
      |p1 AS (SELECT id FROM c1),
      |s1 AS MATERIALIZED (
      |  SELECT e.id, e.v,
      |         round(1 - list_cosine_similarity(e.v,
      |           (SELECT v FROM emb WHERE id = (SELECT id FROM c1))), 6) AS d
      |  FROM emb e
      |)""".stripMargin
    val steps = (2 to k).map { i =>
      s"""
      |, c$i AS MATERIALIZED (
      |  SELECT id, d FROM s${i - 1}
      |  WHERE id NOT IN (SELECT id FROM p${i - 1})
      |  ORDER BY d DESC, id LIMIT 1),
      |p$i AS MATERIALIZED (SELECT id FROM p${i - 1}
      |  UNION ALL SELECT id FROM c$i),
      |s$i AS MATERIALIZED (
      |  SELECT s.id, s.v,
      |         least(s.d, round(1 - list_cosine_similarity(s.v,
      |           (SELECT v FROM emb WHERE id = (SELECT id FROM c$i))), 6)) AS d
      |  FROM s${i - 1} s
      |)""".stripMargin
    }.mkString
    val selRows = ("SELECT 1 AS sel_rank, (SELECT id FROM c1) AS vec_id, " +
      "CAST(2.0 AS DOUBLE) AS sel_d") +:
      (2 to k).map(i => s"SELECT $i, (SELECT id FROM c$i), (SELECT d FROM c$i)")
    val tail = s"""
      |, sel AS (${selRows.mkString(" UNION ALL ")}),
      |radius AS (SELECT max(d) AS r FROM s$k),
      |sep AS (
      |  SELECT min(round(1 - list_cosine_similarity(a.v, b.v), 6)) AS m
      |  FROM sel sa JOIN emb a ON a.id = sa.vec_id,
      |       sel sb JOIN emb b ON b.id = sb.vec_id
      |  WHERE a.id < b.id
      |)
      |SELECT sel.sel_rank, sel.vec_id, sel.sel_d,
      |       radius.r AS radius, sep.m AS separation,
      |       (sep.m >= radius.r) AS sep_ok
      |FROM sel, radius, sep ORDER BY sel.sel_rank""".stripMargin
    (head + steps + tail).trim
  }
}
