package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.oracle.js.JsLang

/** The master's record-lookup patch machinery (the reference's astRaccoon,
  * master/ast_raccoon.go): site detection over the FIRST function's body,
  * the IsParameterPositionARecordLookup set, and PatchCode splicing
  * `records.Find(param)` -> `records.New(<json>)`.
  */
class JsPatchSpec extends AnyFunSuite {

  private val findSimilar =
    """function findSimilar(id, threshold) {
      |  var v = records.Find(id);
      |  if (v.IsNull()) { return ctx.Error('Vector ' + id + ' not found.'); }
      |  return v.ID;
      |}""".stripMargin

  test("detects records.Find(param) sites and lookup positions") {
    val sites = JsLang.recordFindSites(findSimilar)
    assert(sites.map(_.arg) === Seq("id"))
    assert(JsLang.recordLookupParams(findSimilar,
      Seq("id", "threshold")) === Set(0))
  }

  test("whitespace in the callee does not defeat detection (reference strips it)") {
    val src = "function f(a) { return records . Find ( a ); }"
    assert(JsLang.recordFindSites(src).map(_.arg) === Seq("a"))
  }

  test("non-lookup shapes are excluded: chained callee, non-identifier arg, multi-arg") {
    assert(JsLang.recordFindSites(
      "function f(a) { return foo.records.Find(a); }").isEmpty)
    assert(JsLang.recordFindSites(
      "function f(a) { return records.Find(a + 1); }").isEmpty)
    assert(JsLang.recordFindSites(
      "function f(a, b) { return records.Find(a, b); }").isEmpty)
    // a literal id is not a PARAMETER lookup even though the site exists
    assert(JsLang.recordLookupParams(
      "function f(a) { return records.Find(b); }", Seq("a")) === Set.empty)
  }

  test("sites inside comments, strings, and the merger function do not count") {
    val src =
      """function f(a) {
        |  // records.Find(a)
        |  var s = "records.Find(a)";
        |  return 1;
        |}
        |function mergeF(partials) { return records.Find(partials); }
        |""".stripMargin
    assert(JsLang.recordFindSites(src).isEmpty)
  }

  test("patch splices records.New(json) at every matching site, others untouched") {
    val src =
      """function f(a, b) {
        |  var x = records.Find(a);
        |  var y = records.Find(b);
        |  var z = records.Find(a);
        |  return x.ID + y.ID + z.ID;
        |}""".stripMargin
    val patched = JsLang.patchRecordLookups(src, Seq("a", "b"),
      Map(0 -> """{"id":7,"data":[1.0]}"""))
    assert(patched.contains("""var x = records.New({"id":7,"data":[1.0]});"""))
    assert(patched.contains("""var z = records.New({"id":7,"data":[1.0]});"""))
    assert(patched.contains("var y = records.Find(b);"))
    // the patched source still parses
    JsLang.parse(patched)
  }

  test("patch with an unresolved map is the identity") {
    assert(JsLang.patchRecordLookups(findSimilar, Seq("id", "threshold"),
      Map.empty) === findSimilar)
  }

  test("unparseable source yields no sites instead of throwing") {
    assert(JsLang.recordFindSites("SELECT * FROM t WHERE !!!").isEmpty)
    assert(JsLang.recordFindSites("no function here").isEmpty)
  }

  test("fuzz: a patched-in record is indistinguishable from a stored one") {
    // the semantic contract behind PatchCode: running the PATCHED code
    // against a node that does NOT hold the record must equal running
    // the ORIGINAL code against a node that does — including meta
    // strings that stress the JSON-escape -> JS-string-unescape
    // round-trip and float data that stresses double widening
    import graft.model.SumRecord
    import graft.oracle.OracleContext
    import graft.oracle.js.JsOracle
    import graft.service.SumFederation
    import org.json4s.{JInt, JString}

    val spark = TestSpark.spark
    val code =
      """function probe(id, k) {
        |  var v = records.Find(id);
        |  if (v.IsNull()) { return null; }
        |  var d = [];
        |  for (var i = 0; i < v.Size; i++) { d.push(v.Get(i)); }
        |  return {id: v.ID, size: v.Size, meta: v.Meta(k), data: d};
        |}""".stripMargin
    val original = JsOracle.compile("probe", code)
      .fold(m => fail(s"compile failed: $m"), identity)
    val emptyStore = graft.store.RecordStore.empty(spark)

    val nasty = Seq("plain", "with \"quotes\"", "back\\slash", "new\nline",
      "tab\there", "unicode é中文 😀",
      "ctrlchar", "records.Find(id)", "'single'", "</script>", "")
    val rnd = new scala.util.Random(20260816L)
    (1 to 60).foreach { trial =>
      val dim = 1 + rnd.nextInt(6)
      val data = Array.fill(dim)((rnd.nextGaussian() *
        math.pow(10, rnd.nextInt(9) - 4)).toFloat)
      val key = nasty(rnd.nextInt(nasty.length))
      val rec = SumRecord(1L + rnd.nextInt(1000), data,
        Map(key -> nasty(rnd.nextInt(nasty.length)), "k2" -> s"v$trial"))
      val args = Seq(JInt(rec.id), JString(key))

      val owningStore = graft.store.RecordStore.fromRecords(spark, Seq(rec))
      val direct = original.body(new OracleContext, owningStore, args)

      val patchedCode = JsLang.patchRecordLookups(code, Seq("id", "k"),
        Map(0 -> SumFederation.recordJson(rec)))
      assert(patchedCode != code, s"trial $trial: patch did not splice")
      val patched = JsOracle.compile("probe", patchedCode)
        .fold(m => fail(s"trial $trial compile failed: $m\n$patchedCode"),
          identity)
      val viaPatch = patched.body(new OracleContext, emptyStore, args)

      assert(viaPatch === direct, s"trial $trial diverged\n$patchedCode")
    }
  }
}
