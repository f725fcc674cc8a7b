package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.SumRecord
import graft.oracle._
import graft.store.RecordStore

/** Dynamic SQL oracle surface (graft.oracle.SqlOracle): the reference's
  * compile-at-CreateOracle contract (node/service/compiler.go:19-75) —
  * broken text rejects at create with a compile message
  * (oracles_test.go:14-23), params come from the declaration (here: the
  * `:name` markers), and run binds JSON args with missing -> null.
  */
class SqlOracleSpec extends SparkSpec {

  private def store3: RecordStore = RecordStore.fromRecords(spark, Seq(
    SumRecord(1, Array(1f, 0f, 0f), Map("name" -> "one")),
    SumRecord(2, Array(1f, 0f, 0f), Map("name" -> "two")),
    SumRecord(3, Array(0f, 1f, 0f), Map("name" -> "three"))))

  test("createSql compiles and registers a valid query") {
    val reg = new OracleRegistry
    val r = reg.createSql(spark, "countRecords",
      "SELECT count(*) AS n FROM records")
    assert(r.isRight)
    assert(r.toOption.get.params === Seq.empty)
    assert(reg.size === 1)
  }

  test("broken text is rejected AT CREATE with a compile message") {
    val reg = new OracleRegistry
    val r = reg.createSql(spark, "brokenOracle", "lulz i won't compile =)")
    assert(r.isLeft)
    assert(r.swap.toOption.get.startsWith("compile error:"))
    assert(reg.size === 0) // nothing registered, like the reference
  }

  test("valid syntax over a nonexistent column rejects at create (analysis)") {
    val reg = new OracleRegistry
    val r = reg.createSql(spark, "badColumn",
      "SELECT no_such_column FROM records")
    assert(r.isLeft)
    assert(r.swap.toOption.get.startsWith("compile error:"))
  }

  test("commands are rejected — the 'expected a declaration' analogue") {
    val reg = new OracleRegistry
    val r = reg.createSql(spark, "notAQuery", "DROP TABLE records")
    assert(r === Left("expected a query"))
  }

  test("params are read from :name markers in discovery order") {
    val reg = new OracleRegistry
    val o = reg.createSql(spark, "findByIdRange",
      "SELECT id FROM records WHERE id >= :lo AND id <= :hi ORDER BY id")
      .toOption.get
    assert(o.params === Seq("lo", "hi"))
  }

  test("run binds positional JSON args and returns JSON rows") {
    val reg = new OracleRegistry
    val o = reg.createSql(spark, "findByIdRange",
      "SELECT id FROM records WHERE id >= :lo AND id <= :hi ORDER BY id")
      .toOption.get
    val out = reg.run(o.id, store3, Seq("1", "2")).toOption.get
    assert(out === """[{"id":1},{"id":2}]""")
  }

  test("missing args decode to null (empty result, no error)") {
    val reg = new OracleRegistry
    val o = reg.createSql(spark, "findByIdRange",
      "SELECT id FROM records WHERE id >= :lo AND id <= :hi ORDER BY id")
      .toOption.get
    // :hi missing -> null -> predicate unknown -> no rows, run succeeds.
    assert(reg.run(o.id, store3, Seq("1")) === Right("[]"))
  }

  test("vector data and meta are queryable through the records view") {
    val reg = new OracleRegistry
    val o = reg.createSql(spark, "metaOfDoubles",
      """SELECT r.id, r.meta['name'] AS name, size(r.data) AS dims
        |FROM records r WHERE r.data[0] > :minFirst ORDER BY r.id
        |""".stripMargin).toOption.get
    val out = reg.run(o.id, store3, Seq("0.5")).toOption.get
    assert(out ===
      """[{"id":1,"name":"one","dims":3},{"id":2,"name":"two","dims":3}]""")
  }

  test("duplicate (name, sql) create is rejected with the reference message") {
    val reg = new OracleRegistry
    val sql = "SELECT count(*) AS n FROM records"
    assert(reg.createSql(spark, "dup", sql).isRight)
    assert(reg.createSql(spark, "dup", sql) === Left("oracle already created"))
    // Same name, different text: allowed (last-match-wins findByName).
    assert(reg.createSql(spark, "dup",
      "SELECT count(*) AS m FROM records").isRight)
  }

  test("compiled SQL oracles go through the standard run error paths") {
    val reg = new OracleRegistry
    val o = reg.createSql(spark, "castDouble",
      "SELECT CAST(:x AS DOUBLE) AS q").toOption.get
    // JSON cannot carry Inf; the registry's NaN/Inf guard applies to SQL
    // oracles exactly as to registered Scala bodies.
    assert(reg.run(o.id, store3, Seq("\"Infinity\"")) ===
      Left("json: unsupported value: +Inf"))
    assert(JsonMethods.parse(
      reg.run(o.id, store3, Seq("2")).toOption.get) ===
      JArray(List(JObject(List("q" -> JDouble(2.0))))))
  }
}
