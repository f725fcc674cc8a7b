package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.oracle.Payload
import graft.sources.TableIO
import graft.streaming.EventStreams

/** Source/sink round trips, the gzip result envelope, and the
  * stream-stream interval join (batch run as oracle).
  */
class IoPayloadSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("csv and json round-trip the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    TableIO.writeCsv(docs, s"$dir/csv")
    TableIO.writeJson(docs, s"$dir/json")
    val fromCsv = TableIO.readCsv(spark, s"$dir/csv", docs.schema)
    val fromJson = TableIO.readJson(spark, s"$dir/json", docs.schema)
    val orig = docs.orderBy($"doc_id").collect().map(_.toSeq)
    assert(fromCsv.orderBy($"doc_id").collect().map(_.toSeq).toSeq === orig.toSeq)
    assert(fromJson.orderBy($"doc_id").collect().map(_.toSeq).toSeq === orig.toSeq)
  }

  test("partitioned write prunes by partition column") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    TableIO.writePartitioned(docs, s"$dir/bylang", "lang")
    val back = spark.read.parquet(s"$dir/bylang").filter($"lang" === "en")
    assert(back.count() === docs.filter($"lang" === "en").count())
    // partition filter reaches the listing, not the row scan
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"), "lang should be partition-pruned, not row-filtered")
  }

  test("compactParquet collapses fragments without changing content") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    docs.repartition(30).write.mode("overwrite").parquet(s"$dir/frag")
    def partFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.startsWith("part-"))
    assert(partFiles(s"$dir/frag") === 30)
    graft.ops.Lake.compactParquet(spark, s"$dir/frag", s"$dir/out",
      targetFileBytes = 64L * 1024 * 1024)
    assert(partFiles(s"$dir/out") < 30) // tiny table -> a handful of files
    val a = docs.orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(s"$dir/out")
      .select(docs.columns.map(col): _*)
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(b === a)
  }

  test("zorderWrite: files prune on BOTH dimensions, linear sort on one") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    graft.ops.Lake.zorderWrite(li, s"$dir/z", "l_partkey", "l_suppkey", 16)
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lin")

    // Candidate files for a point predicate = files whose footer-style
    // [min,max] interval contains the value (what a parquet reader's
    // file/row-group skip does with the same stats).
    def candidates(d: String, column: String, v: Long): Int = {
      val files = new java.io.File(d).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.toString)
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(column)).cast("long"), max(col(column)).cast("long")).first()
        r.getLong(0) <= v && v <= r.getLong(1)
      }
    }
    val stats = li.agg(
      min($"l_partkey").cast("long"), max($"l_partkey").cast("long"),
      min($"l_suppkey").cast("long"), max($"l_suppkey").cast("long")).first()
    val midPart = (stats.getLong(0) + stats.getLong(1)) / 2
    val midSupp = (stats.getLong(2) + stats.getLong(3)) / 2

    // Z-order: a point predicate on EITHER dimension skips at least half
    // the files (each file is a rectangle in (part, supp) space).
    assert(candidates(s"$dir/z", "l_partkey", midPart) <= 8)
    assert(candidates(s"$dir/z", "l_suppkey", midSupp) <= 8)
    // Linear sort serves its own column strictly better...
    assert(candidates(s"$dir/lin", "l_partkey", midPart) <= 2)
    // ...but cannot prune the other: every file spans ~the full suppkey
    // range, which is exactly the gap z-order exists to close.
    assert(candidates(s"$dir/lin", "l_suppkey", midSupp) >= 12)

    // Layout only — content identical.
    assert(spark.read.parquet(s"$dir/z").count() === li.count())
  }

  test("payload envelope gzips above the 2 KiB threshold and round-trips") {
    val small = Payload.buildString("x" * 100)
    assert(!small.compressed && Payload.openString(small) === "x" * 100)
    val big = Payload.buildString("y" * 10000)
    assert(big.compressed)
    assert(big.size < 10000) // actually compressed
    assert(Payload.openString(big) === "y" * 10000)
  }

  test("stream-stream purchase attribution matches the batch run") {
    implicit val sqlCtx = spark.sqlContext
    def ts(day: Int, hour: Int) = Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    val rows = Seq(
      (1L, ts(1, 9), "signup", 0.0),
      (2L, ts(3, 10), "purchase", 42.0),   // 2 days after signup -> attributed
      (3L, ts(20, 10), "purchase", 7.0),   // 19 days after -> outside 7d window
      (4L, ts(2, 1), "purchase", 5.0))     // user 2 has no signup
    val df = rows.zipWithIndex.map { case ((u, t, k, v), i) =>
      (i.toLong, t, if (u == 4) 2L else 1L, k, v)
    }.toDF("event_id", "event_time", "user_id", "event_type", "value")

    val batch = EventStreams.purchaseAttribution(df)
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    assert(batch === Set(1L)) // only event_id 1 (the day-3 purchase)

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    stream.addData(rows.zipWithIndex.map { case ((u, t, k, v), i) =>
      (i.toLong, t, if (u == 4) 2L else 1L, k, v)
    }: _*)
    val q = EventStreams.purchaseAttribution(
        stream.toDF.toDF("event_id", "event_time", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attr_out")
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    assert(streamed === batch)
  }
}
