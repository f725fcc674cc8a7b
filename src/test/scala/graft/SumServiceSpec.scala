package graft

import org.json4s.jackson.JsonMethods

import graft.model.SumRecord
import graft.oracle.Payload
import graft.service.SumService

/** End-to-end service facade: the reference's e2e shape — create records,
  * create oracle, Run, decompress, JSON-compare
  * (master/service_test.go:260-342) — against the 14-RPC surface.
  */
class SumServiceSpec extends SparkSpec {

  private def freshService: SumService = {
    val svc = SumService(spark)
    svc.createRecord(SumRecord(0, Array(1f, 0f, 0f), Map("name" -> "one")))
    svc.createRecord(SumRecord(0, Array(1f, 0f, 0f), Map("name" -> "two")))
    svc.createRecord(SumRecord(0, Array(0f, 1f, 0f), Map("name" -> "three")))
    svc
  }

  test("record CRUD round trip with reference response semantics") {
    val svc = freshService
    assert(svc.readRecord(1L).msg === "record found")
    assert(svc.readRecord(666L) ===
      graft.service.RecordResponse(success = false, "record 666 not found."))
    val created = svc.createRecord(SumRecord(0, Array(9f)))
    assert(created.success && created.msg === "4") // id echo in msg
    val page = svc.listRecords(1, 2)
    assert(page.total === 4L && page.pages === 2L)
    assert(page.records.map(_.id) === Seq(1L, 2L))
    assert(svc.deleteRecord(4L).success)
    assert(svc.findRecords("name", "two").records.map(_.id) === Seq(2L))
    assert(!svc.findRecords("nope", "x").success)
  }

  test("findSimilar end-to-end through Run: create -> run -> decode") {
    val svc = freshService
    val oracle = svc.findOracle("findSimilar").oracle.get
    val resp = svc.run(oracle.id, Seq("1", "0.9"))
    assert(resp.success, resp.msg)
    val json = Payload.openString(resp.data.get)
    val parsed = JsonMethods.parse(json).values.asInstanceOf[Map[String, Any]]
    assert(parsed.keySet === Set("2")) // record 2 is the double of record 1
  }

  test("run failures surface as unsuccessful responses, not exceptions") {
    val svc = freshService
    val oracle = svc.findOracle("findSimilar").oracle.get
    // Run failures wrap in the node RPC's exact spelling
    // (node/service/service.go:146, service_test.go:420); only the
    // pre-run oracle lookup failure stays bare (service.go:131).
    val missing = svc.run(oracle.id, Seq("666", "0.5"))
    assert(!missing.success && missing.msg ===
      s"error while running oracle ${oracle.id}: record 666 not found.")
    val badOracle = svc.run(999L, Seq.empty)
    assert(!badOracle.success && badOracle.msg === "oracle 999 not found.")
  }

  test("large results come back gzip-enveloped") {
    val svc = SumService(spark)
    (1 to 60).foreach(i => svc.createRecord(
      SumRecord(0, Array.fill(4)(i.toFloat), Map("name" -> ("n" * 50 + i)))))
    val oracle = svc.findOracle("mapOfRecordNames").oracle.get
    val resp = svc.run(oracle.id, Seq.empty)
    assert(resp.success)
    assert(resp.data.get.compressed) // > 2 KiB payload
    val parsed = JsonMethods.parse(Payload.openString(resp.data.get))
      .values.asInstanceOf[Map[String, Any]]
    assert(parsed.size === 60)
  }

  test("info reflects store and registry state") {
    val svc = freshService
    val i = svc.info()
    assert(i.records === 3L && i.oracles === 4L && i.nextRecordId === 4L)
  }
}
