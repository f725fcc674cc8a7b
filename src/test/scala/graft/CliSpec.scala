package graft

import graft.service.SumService

/** The sumcli-mirroring verb dispatcher, driven against a live service:
  * CRUD round-trip, find, oracle run, unknown-verb handling, quit.
  */
class CliSpec extends SparkSpec {

  test("cli verbs round-trip records and run the flagship oracle") {
    val svc = SumService(spark)
    def run(line: String): String = Cli.dispatch(svc, line).get

    assert(run("info").contains("\"records\":0"))
    assert(run("create-record 3,6,9 lang=en").contains("\"msg\":\"1\""))
    assert(run("create-record 3,6,9 lang=de").contains("\"msg\":\"2\""))
    assert(run("create-record 1,0,0").contains("\"msg\":\"3\""))
    assert(run("list-records 1 10").contains("\"records\":[1,2,3]"))
    assert(run("find-records lang en").contains("\"ids\":[1]"))
    assert(run("find-oracle findSimilar").contains("\"name\":\"findSimilar\""))
    // findSimilar(1, 0.5): record 2 is an exact duplicate -> cosine 1.0
    assert(run("run 1 1 0.5").contains("\"2\":1.0"))
    assert(run("delete-record 3").contains("\"success\":true"))
    assert(run("info").contains("\"records\":2"))
    assert(run("bogus").contains("unknown command"))
    // malformed arguments surface as an error response, never a crash
    assert(run("create-record").contains("bad arguments"))
    assert(run("read-record notanumber").contains("bad arguments"))
    assert(Cli.dispatch(svc, "quit").isEmpty)
  }
}
