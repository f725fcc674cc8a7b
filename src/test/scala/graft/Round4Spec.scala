package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling
import graft.queries.{MixQueries, SeriesQueries, SourceQueries, StreamingQueries}

/** Round-4 surfaces: domain mixing, global shuffle, shared-fingerprint
  * dedup, gap-fill, source round-trips, and the streaming-gate queries.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String, dir: String = sf) =
    SparkEntry.queries(name)(spark, dir)

  test("epochMix replicates by weight: floor copies + deterministic fraction") {
    val docs = Seq.tabulate(100)(i => (i.toLong, if (i < 50) "a" else "b"))
      .toDF("doc_id", "source")
    val mixed = Sampling.epochMix(docs, "doc_id", "source",
      Map("a" -> 2.0, "b" -> 0.5))
    val bySrc = mixed.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") === 100L) // exactly 2 epochs of every 'a' doc
    assert(bySrc("b") > 0L && bySrc("b") < 50L) // ~half of 'b' kept once
    // Determinism: same input -> identical multiset of (doc_id, epoch).
    val again = Sampling.epochMix(docs, "doc_id", "source",
      Map("a" -> 2.0, "b" -> 0.5))
    assert(mixed.select("doc_id", "epoch").except(again.select("doc_id", "epoch")).isEmpty)
  }

  test("globalShuffle assigns a dense permutation matching the naive order") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val shuffled = Sampling.globalShuffle(docs, "doc_id", "shuf42", shards = 8)
    val n = docs.count()
    val positions = shuffled.select($"position").as[Long].collect().sorted
    assert(positions.toSeq === (1L to n).toSeq, "positions must be a dense permutation")
    // Bucketed computation == one naive global window.
    val naive = docs
      .withColumn("skey", md5(concat(lit("shuf42:"), $"doc_id".cast("string"))))
      .withColumn("position", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"skey", $"doc_id")))
      .select($"position", $"doc_id")
    assert(shuffled.select($"position", $"doc_id").except(naive).isEmpty)
  }

  test("d07 pairs docs sharing a long substring; boilerplate fp guard holds") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alpha $common omega"),
      (2L, s"totally different prefix $common and suffix"),
      (3L, "nothing in common with anything else here at all today")
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
      .withColumn("lang", lit("en")).withColumn("n_chars", length($"text"))
    docs.createOrReplaceTempView("r4_docs")
    // Run the same pipeline as d07 directly over the tiny frame.
    val k = 8; val w = 4
    val fps = docs.filter(length($"text") >= k + w - 1)
      .select($"doc_id", graft.ops.TextAnalysis.kgramHashes($"text", k).as("hs"))
      .select($"doc_id", explode(graft.ops.TextAnalysis.winnow($"hs", w)).as("fp"))
    val pairs = fps.as("a").join(fps.as("b"), $"a.fp" === $"b.fp" &&
        $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .collect()
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m.getOrElse((1L, 2L), 0L) >= 5L,
      "docs sharing a 60-char substring must share many winnowed fingerprints")
    assert(!m.contains((1L, 3L)) || m((1L, 3L)) < 5L)
  }

  test("q39_gapfill covers the dense hour grid with zero/forward fill") {
    val out = q("q39_gapfill").collect()
    assert(out.nonEmpty)
    val hours = out.map(_.getLong(0)).distinct.sorted
    val step = hours.sliding(2).forall(p => p(1) - p(0) == 3600L)
    assert(step, "hour grid must be dense (every hour present)")
    // n_filled is the last observed count: never negative, and >= n only
    // when the current hour is itself unobserved (n == 0).
    assert(out.forall(r => r.getLong(3) >= 0L))
  }

  test("q40_histogram bins partition all orders and cum_n is monotone") {
    val out = q("q40_histogram").collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(out.map(_.getLong(2)).sum === total)
    val cums = out.map(_.getLong(3))
    assert(cums.zip(cums.drop(1)).forall(p => p._1 < p._2) || cums.length == 1)
    assert(cums.last === total)
  }

  test("csv/json round-trips reproduce direct-parquet aggregates") {
    val t = graft.queries.Tables(spark, sf)
    val direct = t.orders
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaCsv = q("io01_csv_roundtrip").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaCsv === direct)
    val directBal = t.customer.groupBy($"c_mktsegment")
      .agg(round(sum($"c_acctbal"), 2).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaJson = q("io02_json_roundtrip").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(viaJson === directBal, "JSON double round-trip must be exact")
  }

  test("io03 partitioned sink prunes partitions and matches direct filter") {
    val res = q("io03_partitioned_sink").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = graft.queries.Tables(spark, sf).events
      .filter(pmod(expr("ts div 86400000000000"), lit(7)) < 3)
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res === direct)
    // The read-back plan must carry the day predicate as a PARTITION filter
    // (pruned at listing), not a data filter.
    val out = s"/root/repo/target/graft-io/io03_${math.abs(sf.hashCode)}"
    val plan = spark.read.parquet(out).filter(pmod($"day", lit(7)) < 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pmod(day"),
      s"expected partition-filter pruning in:\n$plan")
  }

  test("io07 shard export: one file per shard group, pruned read, manifest round-trip") {
    val q = graft.SparkEntry.queries
    val result = q("io07_shard_export")(spark, sf).collect()
    val out = s"/root/repo/target/graft-io/io07_${math.abs(sf.hashCode)}"
    // The pre-write repartition clusters by the partition key: every
    // (source, grp) shard-GROUP directory must hold exactly ONE parquet
    // file (32 bins per group — the anti-small-files discipline; at sf1
    // per-bin dirs meant ~2000 one-file dirs and 10.8 s of writer/footer
    // overhead).
    val groupDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("source="))
      .flatMap(_.listFiles().filter(_.getName.startsWith("grp=")))
    assert(groupDirs.nonEmpty, "expected source=*/grp=* shard-group directories")
    groupDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"${d.getPath} holds ${files.length} files; groups must be 1 file")
    }
    // A (source, grp) predicate prunes at LISTING time (partition
    // filters); the bin predicate inside the group pushes down to the
    // parquet scan, where the sortWithinPartitions clustering makes
    // row-group stats effective.
    val pruned = spark.read.parquet(out)
      .filter($"source" === "src0" && $"grp" === 0 && $"bin" === 0)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source"),
      s"expected partition-filter pruning in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("bin"),
      s"expected the bin predicate pushed to the scan in:\n$plan")
    // The manifest lives inside the dataset (underscore dir, invisible to
    // parquet listing) and maps every (source, bin) shard exactly once —
    // and it IS the query result (the checked output reads it back).
    val manifest = spark.read.parquet(s"$out/_manifest")
    val shardCount = spark.read.parquet(out)
      .select($"source", $"bin").distinct().count()
    assert(manifest.count() === shardCount)
    assert(result.length.toLong === shardCount)
  }

  test("st01/st02 streaming results equal their batch twins") {
    val batchHourly = q("q13_events_hourly").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamHourly = q("st01_stream_hourly").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamHourly === batchHourly)

    val deduped = q("st02_stream_dedup").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.queries.Tables(spark, sf).events
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(deduped === batch, "doubled stream deduped must equal the plain table")
  }
}
