package graft

import graft.model.SumRecord
import graft.oracle.Payload
import graft.service.{CallResponse, FindResponse, NodeEngine, OracleResponse,
  RecordResponse, SumFederation, SumService}

/** End-to-end federation semantics (round-8 verdict task 8, the last
  * deliberately-red cell): add node -> records rebalance with the
  * reference balancer's arithmetic -> stored oracles absorbed into the
  * master cage -> distributed Run fans out, merges, and aggregates
  * per-node errors in the master's wire format.
  */
class SumFederationSpec extends SparkSpec {

  private def engineWith(ids: Range): SumService = {
    val svc = SumService(spark)
    assert(svc.createRecordsWithId(ids.map(i =>
      SumRecord(i.toLong, Array(i.toFloat, 1f), Map("name" -> s"r$i")))).success)
    svc
  }

  test("addNode rebalances records per balancer.go and absorbs node oracles") {
    val fed = new SumFederation
    val a = engineWith(1 to 100)
    fed.addNode("a", a)
    // One node: targets equal its own count, no movement.
    assert(fed.listNodes().map(_.records) === Seq(100L))

    val b = SumService(spark) // empty store, 4 canonical oracles
    val bOracles = b.oracles.size
    assert(bOracles > 0)
    fed.addNode("b", b)
    // balance: total 100 over 2 nodes -> 50/50 (remainder 0); the donor
    // gives its FIRST records (page-1 id order), so node b now holds
    // ids 1..50.
    assert(fed.listNodes().map(_.records).sorted === Seq(50L, 50L))
    assert(b.store.find(1L).isDefined && a.store.find(1L).isEmpty)
    // agent Smith: the node's oracles moved into the master cage
    // (deduplicated by name+code — both engines started with the same
    // canonical set).
    assert(b.oracles.size === 0)
    assert(fed.oracles.size === bOracles)
  }

  test("balance is a no-op inside the 5% hysteresis band") {
    val fed = new SumFederation
    val a = engineWith(1 to 52)
    val b = engineWith(101 to 148) // 48 records: delta 2 <= target/20 = 2
    fed.addNode("a", a)
    fed.addNode("b", b)
    assert(fed.listNodes().map(_.records) === Seq(52L, 48L))
  }

  test("distributed Run: scatter, user merger, exact total across shards") {
    val fed = new SumFederation
    fed.addNode("a", engineWith(1 to 60))
    fed.addNode("b", engineWith(61 to 100))
    val code = """function sumIds() {
      var all = records.All();
      var t = 0;
      for (var i = 0; i < all.length; i++) t += all[i].ID;
      return t;
    }
    function mergeSums(partials) {
      var s = 0;
      for (var i = 0; i < partials.length; i++) s += partials[i];
      return s;
    }"""
    val oracle = fed.oracles.createJs("sumIds", code)
      .fold(m => fail(s"compile failed: $m"), identity)
    val resp = fed.run(oracle.id, Seq.empty)
    assert(resp.success, resp.msg)
    // Node placement cannot change the answer: sum(1..100) = 5050.
    assert(Payload.openString(resp.data.get) === "5050")
    // Temporary oracles were cleaned up on both nodes.
    fed.listNodes().foreach(n => assert(n.engine.nodeOracles().isEmpty))
  }

  test("distributed Run: default merger unions maps; node errors aggregate in wire format") {
    val fed = new SumFederation
    fed.addNode("a", engineWith(1 to 3))
    fed.addNode("b", engineWith(11 to 13))
    val mapCode = """function idMap() {
      var all = records.All();
      var out = {};
      for (var i = 0; i < all.length; i++) out['' + all[i].ID] = all[i].Size;
      return out;
    }"""
    val o1 = fed.oracles.createJs("idMap", mapCode)
      .fold(m => fail(s"compile failed: $m"), identity)
    val r1 = fed.run(o1.id, Seq.empty)
    assert(r1.success, r1.msg)
    val merged = org.json4s.jackson.JsonMethods.parse(
      Payload.openString(r1.data.get)).values.asInstanceOf[Map[String, Any]]
    assert(merged.keySet === Set("1", "2", "3", "11", "12", "13"))

    val failing = """function boom() { throw 'yuppie!'; }"""
    val o2 = fed.oracles.createJs("boom", failing)
      .fold(m => fail(s"compile failed: $m"), identity)
    val r2 = fed.run(o2.id, Seq.empty)
    assert(!r2.success)
    assert(r2.msg.matches(
      "^Errors from nodes: \\[.*error while running oracle \\d+: yuppie!.*\\]$"),
      r2.msg)
    assert(fed.run(999L, Seq.empty).msg === "oracle 999 not found.")
  }

  test("distributed Run resolves records.Find(param) master-side and patches code") {
    val fed = new SumFederation
    fed.addNode("a", engineWith(1 to 100)) // rebalance leaves ~50 per node
    fed.addNode("b", SumService(spark))
    // the reference's canonical findSimilar shape: the looked-up record
    // lives on exactly ONE node, so without master-side resolution +
    // PatchCode every other node sees a null record and errors out
    // (master/mux_runner.go:49-79, master/ast_raccoon.go:94-149)
    val code =
      """function findSimilar(id, threshold) {
        |  var v = records.Find(id);
        |  if (v.IsNull()) { return ctx.Error('Vector ' + id + ' not found.'); }
        |  var all = records.AllBut(v);
        |  var results = {};
        |  for (var i = 0; i < all.length; i++) {
        |    var s = v.Cosine(all[i]);
        |    if (s >= threshold) results['' + all[i].ID] = s;
        |  }
        |  return results;
        |}""".stripMargin
    val oracle = fed.oracles.createJs("findSimilar", code)
      .fold(m => fail(s"compile failed: $m"), identity)
    val resp = fed.run(oracle.id, Seq("42", "0.0"))
    assert(resp.success, resp.msg)
    val merged = org.json4s.jackson.JsonMethods.parse(
      Payload.openString(resp.data.get)).values.asInstanceOf[Map[String, Any]]
    // every record EXCEPT the target matched on both shards — the proof
    // that the resolved record crossed node boundaries
    assert(merged.keySet === (1 to 100).filter(_ != 42).map(_.toString).toSet)
    // the stored oracle is untouched by the patch (a per-run temporary
    // carries the resolved record)
    assert(fed.oracles.read(oracle.id).toOption.get.code === Some(code))
    fed.listNodes().foreach(n => assert(n.engine.nodeOracles().isEmpty))

    // a missing record patches to records.New(null) -> the null record,
    // so the oracle's own IsNull branch fires on every node
    val notFound = fed.run(oracle.id, Seq("9999", "0.0"))
    assert(!notFound.success)
    assert(notFound.msg.startsWith("Errors from nodes: ["), notFound.msg)
    assert(notFound.msg.contains("Vector 9999 not found."), notFound.msg)

    // an unparseable record id fails BEFORE fan-out with the reference's
    // message (mux_runner.go:58, typo preserved)
    val bad = fed.run(oracle.id, Seq("\"abc\"", "0.0"))
    assert(!bad.success)
    assert(bad.msg.startsWith("Unable to parse record id form parameter #0"),
      bad.msg)
  }

  test("run folds nonconforming node responses into the error aggregate") {
    class StubEngine(idMsg: String, runResp: Long => CallResponse)
        extends NodeEngine {
      def records: Long = 0L
      def nextRecordId: Long = 1L
      def listRecords(page: Long, perPage: Long): Seq[SumRecord] = Seq.empty
      def createRecordWithId(r: SumRecord): RecordResponse =
        RecordResponse(success = true, "")
      def createRecordsWithId(recs: Seq[SumRecord]): RecordResponse =
        RecordResponse(success = true, "")
      def deleteRecords(ids: Seq[Long]): Unit = ()
      def readRecord(id: Long): RecordResponse =
        RecordResponse(success = false, s"record $id not found.")
      def updateRecord(r: SumRecord): RecordResponse =
        RecordResponse(success = false, s"record ${r.id} not found.")
      def deleteRecord(id: Long): RecordResponse =
        RecordResponse(success = false, s"record $id not found.")
      def findRecords(meta: String, value: String): FindResponse =
        FindResponse(success = true, "", Seq.empty)
      def nodeOracles(): Seq[NodeEngine.NodeOracle] = Seq.empty
      def createOracle(o: graft.oracle.Oracle): OracleResponse =
        OracleResponse(success = true, idMsg)
      def deleteOracle(id: Long): Unit = ()
      def run(oracleId: Long, args: Seq[String]): CallResponse =
        runResp(oracleId)
    }
    val code = "function one() { return 1; }"

    // node answers CreateOracle with a non-numeric id
    val fed1 = new SumFederation
    fed1.attach("garbage-id", new StubEngine("not-a-number",
      _ => CallResponse(success = true, "", None)))
    val o1 = fed1.oracles.createJs("one", code)
      .fold(m => fail(s"compile failed: $m"), identity)
    val r1 = fed1.run(o1.id, Seq.empty)
    assert(!r1.success)
    assert(r1.msg ===
      "Errors from nodes: [unable to parse oracleId string 'not-a-number']")

    // node answers Run successfully but with no payload
    val fed2 = new SumFederation
    fed2.attach("empty-payload", new StubEngine("7",
      _ => CallResponse(success = true, "", None)))
    val o2 = fed2.oracles.createJs("one", code)
      .fold(m => fail(s"compile failed: $m"), identity)
    val r2 = fed2.run(o2.id, Seq.empty)
    assert(!r2.success)
    assert(r2.msg.startsWith("Errors from nodes: ["), r2.msg)
    assert(r2.msg.contains("returned an empty payload"), r2.msg)
  }

  test("distributed Run scatters nodes CONCURRENTLY (paralleliser.go)") {
    // each node's run() blocks until BOTH nodes are inside run() — a
    // serial fan-out deadlocks into the latch timeout, a parallel one
    // sails through; no wall-clock assertions, so host load can't flake it
    val gate = new java.util.concurrent.CountDownLatch(2)
    class GatedEngine(key: String) extends NodeEngine {
      def records: Long = 0L
      def nextRecordId: Long = 1L
      def listRecords(page: Long, perPage: Long): Seq[SumRecord] = Seq.empty
      def createRecordWithId(r: SumRecord): RecordResponse =
        RecordResponse(success = true, "")
      def createRecordsWithId(recs: Seq[SumRecord]): RecordResponse =
        RecordResponse(success = true, "")
      def deleteRecords(ids: Seq[Long]): Unit = ()
      def readRecord(id: Long): RecordResponse =
        RecordResponse(success = false, s"record $id not found.")
      def updateRecord(r: SumRecord): RecordResponse =
        RecordResponse(success = false, s"record ${r.id} not found.")
      def deleteRecord(id: Long): RecordResponse =
        RecordResponse(success = false, s"record $id not found.")
      def findRecords(meta: String, value: String): FindResponse =
        FindResponse(success = true, "", Seq.empty)
      def nodeOracles(): Seq[NodeEngine.NodeOracle] = Seq.empty
      def createOracle(o: graft.oracle.Oracle): OracleResponse =
        OracleResponse(success = true, "1")
      def deleteOracle(id: Long): Unit = ()
      def run(oracleId: Long, args: Seq[String]): CallResponse = {
        gate.countDown()
        if (!gate.await(20, java.util.concurrent.TimeUnit.SECONDS))
          CallResponse(success = false, "fan-out was serial", None)
        else CallResponse(success = true, "",
          Some(Payload.buildString(s"""{"$key": 1}""")))
      }
    }
    val fed = new SumFederation
    fed.attach("g1", new GatedEngine("g1"))
    fed.attach("g2", new GatedEngine("g2"))
    val o = fed.oracles.createJs("one", "function one() { return 1; }")
      .fold(m => fail(s"compile failed: $m"), identity)
    val resp = fed.run(o.id, Seq.empty)
    assert(resp.success, resp.msg)
    val merged = org.json4s.jackson.JsonMethods.parse(
      Payload.openString(resp.data.get)).values.asInstanceOf[Map[String, Any]]
    assert(merged.keySet === Set("g1", "g2"))
  }

  test("node status is CACHED and re-synced by the NodeUpdater poll") {
    val fed = new SumFederation
    val svc = engineWith(1 to 10)
    fed.addNode("a", svc)
    val node = fed.listNodes().head
    assert(node.records === 10L)
    // out-of-band write straight to the node: invisible to the master
    // until the next status poll, exactly like NodeInfo.status
    assert(svc.createRecordsWithId(Seq(
      SumRecord(500L, Array(1f, 1f), Map.empty))).success)
    assert(node.records === 10L)
    fed.updateNodes() // NodeUpdater poll body
    assert(node.records === 11L)
    // master-routed create/delete adjust the cache inline
    // (mux_records.go:64/:269) — no Info probe needed
    assert(fed.createRecord(SumRecord(0L, Array(2f, 2f), Map.empty)).success)
    assert(node.records === 12L)
    assert(fed.deleteRecord(1L).success)
    assert(node.records === 11L)
    assert(node.records === svc.store.size)
  }

  test("deleteNode redistributes the departing node's records") {
    val fed = new SumFederation
    val a = engineWith(1 to 40)
    val b = engineWith(101 to 140)
    val c = engineWith(201 to 241) // 41, keeps remainder arithmetic honest
    fed.addNode("a", a)
    fed.addNode("b", b)
    fed.addNode("c", c)
    val idB = fed.listNodes().find(_.name == "b").get.id
    assert(fed.deleteNode(idB).success)
    val after = fed.listNodes()
    assert(after.map(_.name) === Seq("a", "c"))
    // b's 40 records split 20/20 over the survivors; totals conserved.
    assert(after.map(_.records).sum === 121L)
    assert(after.map(_.records) === Seq(60L, 61L))
    assert(fed.deleteNode(99L).msg === "node 99 not found.")
  }
}
