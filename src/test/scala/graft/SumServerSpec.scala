package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.oracle.Payload
import graft.service.{SumServer, SumService}

/** End-to-end over the wire: a [[SumServer]] on an ephemeral port driven
  * through real HTTP requests — create records, compile-and-create a SQL
  * oracle, Run it, and open the gzip envelope, the reference's
  * sumd/sumcli loop (cmd/sumd/main.go:100-121).
  */
class SumServerSpec extends SparkSpec {

  private lazy val client = HttpClient.newHttpClient()

  private def post(base: String, rpc: String, body: String): JValue = {
    val req = HttpRequest.newBuilder(URI.create(s"$base/$rpc"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json").build()
    JsonMethods.parse(client.send(req, HttpResponse.BodyHandlers.ofString()).body())
  }

  private def withServer(f: (SumServer, String) => Unit): Unit = {
    val server = new SumServer(SumService(spark))
    server.start()
    try f(server, server.baseUrl) finally server.stop()
  }

  test("create -> oracle -> Run -> envelope round-trip over the wire") {
    withServer { (_, base) =>
      // Three records via the wire.
      for (i <- 1 to 3) {
        val r = post(base, "CreateRecord",
          s"""{"data":[$i.0, 0.0], "meta":{"name":"rec$i"}}""")
        assert((r \ "success") === JBool(true))
        assert((r \ "msg") === JString(i.toString)) // id echo in msg
      }
      // A SQL oracle compiled at create.
      val oc = post(base, "CreateOracle",
        """{"name":"firstData","code":"SELECT id, data[0] AS x FROM records WHERE id <= :maxId ORDER BY id"}""")
      assert((oc \ "success") === JBool(true))
      val oracleId = (oc \ "oracle" \ "id").asInstanceOf[JInt].num.toLong
      // Run with one arg; small result -> uncompressed envelope.
      val run = post(base, "Run",
        s"""{"oracle_id":$oracleId,"args":["2"]}""")
      assert((run \ "success") === JBool(true))
      assert((run \ "data" \ "compressed") === JBool(false))
      val payload = new String(java.util.Base64.getDecoder.decode(
        (run \ "data" \ "payload").asInstanceOf[JString].s), "UTF-8")
      assert(JsonMethods.parse(payload) === JsonMethods.parse(
        """[{"id":1,"x":1.0},{"id":2,"x":2.0}]"""))
    }
  }

  test("a stored-JavaScript oracle (the reference's own findSimilar) runs over the wire") {
    withServer { (_, base) =>
      // records 1 and 2 collinear, record 3 not
      post(base, "CreateRecord", """{"data":[1.0, 2.0, 3.0], "meta":{}}""")
      post(base, "CreateRecord", """{"data":[2.0, 4.0, 6.0], "meta":{}}""")
      post(base, "CreateRecord", """{"data":[-1.0, 0.0, 1.0], "meta":{}}""")
      // the README oracle, verbatim — dispatched to the JS interpreter
      val js = """function findSimilar(id, threshold) {
        var v = records.Find(id);
        if( v.IsNull() == true ) {
          return ctx.Error(\"Vector \" + id + \" not found.\");
        }
        var results = {};
        var all = records.AllBut(v);
        for( var i = 0; i < all.length; ++i ) {
          var record = all[i];
          var similarity = v.Cosine(record);
          if( similarity >= threshold ) { results[record.Id] = similarity; }
        }
        return results;
      }""".replace("\n", "\\n")
      val oc = post(base, "CreateOracle",
        s"""{"name":"findSimilar","code":"$js"}""")
      assert((oc \ "success") === JBool(true), JsonMethods.compact(JsonMethods.render(oc)))
      val oracleId = (oc \ "oracle" \ "id").asInstanceOf[JInt].num.toLong
      val run = post(base, "Run", s"""{"oracle_id":$oracleId,"args":["1","0.9"]}""")
      assert((run \ "success") === JBool(true), JsonMethods.compact(JsonMethods.render(run)))
      val payload = new String(java.util.Base64.getDecoder.decode(
        (run \ "data" \ "payload").asInstanceOf[JString].s), "UTF-8")
      assert(payload === """{"2":1}""")
      // the oracle's ctx.Error path crosses the wire wrapped in the node
      // RPC's exact spelling (node/service/service.go:146, pinned by
      // service_test.go:420 "error while running oracle 1: nope")
      val miss = post(base, "Run", s"""{"oracle_id":$oracleId,"args":["99","0.5"]}""")
      assert((miss \ "success") === JBool(false))
      assert((miss \ "msg") ===
        JString(s"error while running oracle $oracleId: Vector 99 not found."))
    }
  }

  test("broken oracle code is rejected over the wire at create") {
    withServer { (_, base) =>
      val oc = post(base, "CreateOracle",
        """{"name":"broken","code":"lulz i won't compile =)"}""")
      assert((oc \ "success") === JBool(false))
      assert((oc \ "msg").asInstanceOf[JString].s.startsWith("compile error:"))
      // Nothing registered.
      val ls = post(base, "ListOracles", "{}")
      // Canonical oracles are pre-registered; none named "broken".
      val names = (ls \ "oracles").asInstanceOf[JArray].arr
        .map(o => (o \ "name").asInstanceOf[JString].s)
      assert(!names.contains("broken"))
    }
  }

  test("Run results above 2 KiB arrive gzip-compressed and open to the result") {
    withServer { (_, base) =>
      // 3 records joined against a 100-row spine: 300 rows, >2 KiB of JSON
      // (generating size in the oracle keeps the store mutation count low —
      // each wire create is a full copy-on-write swap by design).
      for (i <- 1 to 3)
        post(base, "CreateRecord", s"""{"data":[$i.0]}""")
      val oc = post(base, "CreateOracle",
        """{"name":"spine","code":"SELECT r.id AS id, t.id AS k, r.data[0] AS x FROM records r CROSS JOIN range(100) t ORDER BY id, k"}""")
      val oracleId = (oc \ "oracle" \ "id").asInstanceOf[JInt].num.toLong
      val run = post(base, "Run", s"""{"oracle_id":$oracleId,"args":[]}""")
      assert((run \ "success") === JBool(true))
      assert((run \ "data" \ "compressed") === JBool(true))
      val raw = java.util.Base64.getDecoder.decode(
        (run \ "data" \ "payload").asInstanceOf[JString].s)
      val opened = Payload.openString(Payload.Envelope(compressed = true, raw))
      val rows = JsonMethods.parse(opened).asInstanceOf[JArray].arr
      assert(rows.size === 300)
      assert((rows.head \ "id") === JInt(1))
      assert(raw.length < opened.length) // actually compressed
    }
  }

  test("record CRUD + find + pagination + info over the wire") {
    withServer { (_, base) =>
      for (i <- 1 to 25)
        post(base, "CreateRecord",
          s"""{"data":[$i.0],"meta":{"tag":"${if (i % 2 == 0) "even" else "odd"}"}}""")
      // Read / missing read.
      assert((post(base, "ReadRecord", """{"id":7}""") \ "success") === JBool(true))
      assert((post(base, "ReadRecord", """{"id":666}""") \ "msg") ===
        JString("record 666 not found."))
      // Pagination: page 3 of 10 has 5.
      val page3 = post(base, "ListRecords", """{"page":3,"per_page":10}""")
      assert((page3 \ "total") === JInt(25))
      assert((page3 \ "pages") === JInt(3))
      assert((page3 \ "records").asInstanceOf[JArray].arr.size === 5)
      // Find by meta.
      val evens = post(base, "FindRecords", """{"meta":"tag","value":"even"}""")
      assert((evens \ "records").asInstanceOf[JArray].arr.size === 12)
      // Delete, then the record is gone.
      assert((post(base, "DeleteRecord", """{"id":7}""") \ "success") === JBool(true))
      assert((post(base, "ReadRecord", """{"id":7}""") \ "success") === JBool(false))
      // Info reflects the store.
      val info = post(base, "Info", "{}")
      assert((info \ "records") === JInt(24))
      assert((info \ "spark_version").asInstanceOf[JString].s.nonEmpty)
    }
  }

  test("oracle CRUD parity over the wire: find/update/delete") {
    withServer { (_, base) =>
      val oc = post(base, "CreateOracle",
        """{"name":"countAll","code":"SELECT count(*) AS n FROM records"}""")
      val id = (oc \ "oracle" \ "id").asInstanceOf[JInt].num.toLong
      assert((post(base, "FindOracle", """{"name":"countAll"}""") \ "success") ===
        JBool(true))
      val up = post(base, "UpdateOracle",
        s"""{"id":$id,"name":"countAll","code":"SELECT count(*) AS total FROM records"}""")
      assert((up \ "success") === JBool(true))
      assert((post(base, "ReadOracle", s"""{"id":$id}""") \ "oracle" \ "code")
        .asInstanceOf[JString].s.contains("AS total"))
      assert((post(base, "DeleteOracle", s"""{"id":$id}""") \ "success") === JBool(true))
      assert((post(base, "FindOracle", """{"name":"countAll"}""") \ "msg") ===
        JString("oracle countAll not found."))
    }
  }
}
