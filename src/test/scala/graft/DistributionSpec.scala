package graft

import org.apache.spark.sql.functions._
import org.json4s._

import graft.functions.vector
import graft.model.SumRecord
import graft.oracle.Merge
import graft.store.RecordStore

/** Distribution parity (SURVEY.md §7.1 item 5): running an oracle as
  * per-partition partials and folding them with the merge layer must equal
  * the single-shot run — the master's scatter-gather + merge protocol
  * (master/mux_runner.go:136-155, 159-232) realized as Spark partitions.
  */
class DistributionSpec extends SparkSpec {

  private def mkStore(n: Int): RecordStore =
    RecordStore.fromRecords(spark, (1 to n).map { i =>
      SumRecord(i.toLong, Array(math.cos(i).toFloat, math.sin(i).toFloat, 1f),
        Map("name" -> s"rec$i"))
    })

  test("per-partition findSimilar partials merge to the whole-store result") {
    val store = mkStore(64)
    val ref = store.find(1L).get
    val threshold = 0.8

    // Whole-store run (what a single node computes).
    val refCol = array(ref.data.map(lit).toIndexedSeq: _*)
    val whole = store.records.filter(col("id") =!= ref.id)
      .select(col("id"), vector.cosine(col("data"), refCol).as("sim"))
      .filter(col("sim") >= threshold)
      .collect().map(r => r.getLong(0).toString -> r.getDouble(1)).toMap

    // Scatter: each of 8 partitions produces its own {id -> sim} partial —
    // the per-node responses of the reference's master fan-out.
    val refData = ref.data
    val refId = ref.id
    import spark.implicits._
    val partials: Seq[JValue] = store.records.repartition(8)
      .mapPartitions { it =>
        val rows = it.filter(_.id != refId).flatMap { r =>
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < math.min(r.data.length, refData.length)) {
            dot += r.data(i).toDouble * refData(i).toDouble
            na += r.data(i).toDouble * r.data(i).toDouble
            nb += refData(i).toDouble * refData(i).toDouble
            i += 1
          }
          val den = math.sqrt(na) * math.sqrt(nb)
          val sim = if (den == 0.0) 0.0 else dot / den
          if (sim >= 0.8) Some(r.id -> sim) else None
        }.toSeq
        Iterator.single(rows)
      }.collect().toSeq
      .map(rows => JObject(rows.map { case (id, sim) =>
        id.toString -> (JDouble(sim): JValue) }.toList))

    // Gather: default map-union merge.
    val merged = Merge.defaultMerger(partials).toOption.get.asInstanceOf[JObject]
      .obj.toMap.map { case (k, JDouble(d)) => k -> d; case (k, _) => k -> 0.0 }

    assert(merged.keySet === whole.keySet)
    merged.foreach { case (k, v) => assert(math.abs(v - whole(k)) < 1e-9) }
    assert(merged.nonEmpty)
  }

  test("partition counts merged as arrays concatenate to the full scan") {
    import spark.implicits._
    val store = mkStore(32)
    val partials = store.records.repartition(4)
      .mapPartitions(it => Iterator.single(it.map(_.id).toList))
      .collect().toSeq
      .map(ids => JArray(ids.map(id => JLong(id): JValue)))
    val merged = Merge.defaultMerger(partials).toOption.get.asInstanceOf[JArray]
    assert(merged.arr.size === 32)
    assert(merged.arr.collect { case JLong(l) => l }.toSet === (1L to 32L).toSet)
  }

  test("EngineInfo reports counts like Service.Info") {
    val store = mkStore(5)
    val reg = new graft.oracle.OracleRegistry
    graft.oracle.CanonicalOracles.registerAll(reg)
    val info = EngineInfo(spark, store, reg)
    assert(info.records === 5L && info.oracles === 4L && info.nextRecordId === 6L)
    assert(info.cpus > 0 && info.sparkVersion.startsWith("4."))
  }
}
