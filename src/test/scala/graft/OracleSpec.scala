package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.SumRecord
import graft.oracle._
import graft.store.RecordStore

/** Oracle runtime + merge-semantics parity: canonical oracles against
  * hand-computed fixtures (master/service_test.go) and the defaultMerger
  * tri-state error modes (master/mux_runner.go:195-232).
  */
class OracleSpec extends SparkSpec {

  private def store3: RecordStore = RecordStore.fromRecords(spark, Seq(
    SumRecord(1, Array(1f, 0f, 0f), Map("name" -> "one")),
    SumRecord(2, Array(1f, 0f, 0f), Map("name" -> "two")),   // double of 1
    SumRecord(3, Array(0f, 1f, 0f), Map("name" -> "three"))))

  test("findSimilar returns {id -> sim} above threshold") {
    val reg = new OracleRegistry
    val o = reg.create(CanonicalOracles.findSimilar).toOption.get
    val out = reg.run(o.id, store3, Seq("1", "0.9")).toOption.get
    val parsed = JsonMethods.parse(out).asInstanceOf[JObject].obj.toMap
    assert(parsed.keySet === Set("2"))
    assert(parsed("2").asInstanceOf[JDouble].num === 1.0)
  }

  test("findSimilar on a missing record fails with the reference message") {
    val reg = new OracleRegistry
    val o = reg.create(CanonicalOracles.findSimilar).toOption.get
    assert(reg.run(o.id, store3, Seq("666", "0.5")) === Left("record 666 not found."))
  }

  test("findDoubles finds the equal-vector pair") {
    val reg = new OracleRegistry
    val o = reg.create(CanonicalOracles.findDoubles).toOption.get
    val out = reg.run(o.id, store3, Seq.empty).toOption.get
    assert(out === "[[1,2]]")
  }

  test("sumAllVectors sums element-wise") {
    val reg = new OracleRegistry
    val o = reg.create(CanonicalOracles.sumAllVectors).toOption.get
    val out = reg.run(o.id, store3, Seq.empty).toOption.get
    assert(out === "[2.0,1.0,0.0]")
  }

  test("sumAllVectors on an empty store returns an empty array") {
    val reg = new OracleRegistry
    val o = reg.create(CanonicalOracles.sumAllVectors).toOption.get
    assert(reg.run(o.id, RecordStore.empty(spark), Seq.empty) === Right("[]"))
  }

  test("sumAllVectors merger folds partials element-wise") {
    val parts = Seq(
      JArray(List(JDouble(1.0), JDouble(2.0))),
      JArray(List(JDouble(3.0), JDouble(4.0))))
    val merged = graft.oracle.Merge.merge(parts, CanonicalOracles.sumAllVectors.merger)
    assert(merged === Right(JArray(List(JDouble(4.0), JDouble(6.0)))))
  }

  test("mapOfRecordNames builds the id->name map") {
    val reg = new OracleRegistry
    val o = reg.create(CanonicalOracles.mapOfRecordNames).toOption.get
    val out = reg.run(o.id, store3, Seq.empty).toOption.get
    val parsed = JsonMethods.parse(out).asInstanceOf[JObject].obj.toMap
    assert(parsed("1") === JString("one") && parsed("3") === JString("three"))
  }

  test("default merge: maps union; duplicate key conflicts (mux_runner.go:216)") {
    val ok = graft.oracle.Merge.defaultMerger(Seq(
      JObject(List("a" -> JInt(1))), JObject(List("b" -> JInt(2)))))
    assert(ok === Right(JObject(List("a" -> JInt(1), "b" -> JInt(2)))))
    val conflict = graft.oracle.Merge.defaultMerger(Seq(
      JObject(List("a" -> JInt(1))), JObject(List("a" -> JInt(2)))))
    assert(conflict ===
      Left("merge conflict: multiple results define key a: oldValue='1', newValue='2'"))
  }

  test("default merge: arrays concatenate") {
    val merged = graft.oracle.Merge.defaultMerger(Seq(
      JArray(List(JInt(1))), JArray(List(JInt(2), JInt(3)))))
    assert(merged === Right(JArray(List(JInt(1), JInt(2), JInt(3)))))
  }

  test("default merge: heterogeneous types error (mux_runner.go:205)") {
    val bad = graft.oracle.Merge.defaultMerger(Seq(JObject(Nil), JArray(Nil)))
    assert(bad === Left(
      "heterogeneous results: prior results had type map, this one has type array"))
  }

  test("default merge: scalars demand a custom merger (mux_runner.go:230)") {
    val bad = graft.oracle.Merge.defaultMerger(Seq(JInt(1), JInt(2)))
    assert(bad ===
      Left("type number is not supported for auto-merge, please provide a custom merge function"))
  }

  test("user merger failure is reported (mux_runner.go:159-192)") {
    val boom: Seq[JValue] => JValue = _ => throw new RuntimeException("nope")
    val r = graft.oracle.Merge.merge(Seq(JInt(1)), Some(boom))
    assert(r === Left("merger function failed: nope"))
  }

  test("missing args decode to null; bad JSON is rejected (compiled.go:53-77)") {
    val reg = new OracleRegistry
    val echo = Oracle(0, "echo", Seq("x"),
      (_, _, args) => args.head)
    val o = reg.create(echo).toOption.get
    val store = RecordStore.empty(spark)
    assert(reg.run(o.id, store, Seq.empty) === Right("null"))
    assert(reg.run(o.id, store, Seq("{bad")).swap.toOption.get
      .startsWith("could not unmarshal value '{bad'"))
  }

  test("ctx.Error aborts the run with its message (context.go:9-48)") {
    val reg = new OracleRegistry
    val failing = Oracle(0, "failing", Seq.empty,
      (ctx, _, _) => { ctx.error("error!"); JNull })
    val o = reg.create(failing).toOption.get
    assert(reg.run(o.id, RecordStore.empty(spark), Seq.empty) === Left("error!"))
  }

  test("NaN/Inf results fail marshaling with the reference's message") {
    val reg = new OracleRegistry
    val store = RecordStore.empty(spark)
    val nan = reg.create(Oracle(0, "nan", Seq.empty,
      (_, _, _) => JDouble(Double.NaN))).toOption.get
    assert(reg.run(nan.id, store, Seq.empty) ===
      Left("json: unsupported value: NaN"))
    val inf = reg.create(Oracle(0, "inf", Seq.empty,
      (_, _, _) => JObject(List("x" -> JDouble(Double.PositiveInfinity))))).toOption.get
    assert(reg.run(inf.id, store, Seq.empty) ===
      Left("json: unsupported value: +Inf"))
    val ninf = reg.create(Oracle(0, "ninf", Seq.empty,
      (_, _, _) => JArray(List(JDouble(Double.NegativeInfinity))))).toOption.get
    assert(reg.run(ninf.id, store, Seq.empty) ===
      Left("json: unsupported value: -Inf"))
  }

  test("registry: find-by-name last match wins; pagination; delete") {
    val reg = new OracleRegistry
    val a1 = reg.create(Oracle(0, "x", Seq.empty, (_, _, _) => JInt(1))).toOption.get
    val a2 = reg.create(Oracle(0, "x", Seq.empty, (_, _, _) => JInt(2))).toOption.get
    assert(reg.findByName("x").toOption.get.id === a2.id)
    assert(reg.findByName("zz") === Left("oracle zz not found."))
    val (total, pages, page1) = reg.list(1, 1)
    assert(total === 2L && pages === 2L && page1.map(_.id) === Seq(a1.id))
    assert(reg.delete(a1.id).isRight)
    assert(reg.read(a1.id) === Left(s"oracle ${a1.id} not found."))
  }
}
