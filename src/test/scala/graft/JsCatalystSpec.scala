package graft

import org.json4s._

import graft.model.SumRecord
import graft.oracle.js.{JsCatalyst, JsOracle}
import graft.store.RecordStore

/** The JS→Catalyst linear-shape transpiler: every conforming oracle must
  * produce BIT-IDENTICAL merged results to the tree-walking interpreter
  * on the same store (same partials, same merge layer), every
  * non-conforming probe must be refused (None → interpreter path), and a
  * tripped guard must surface the interpreter's exact error.
  */
class JsCatalystSpec extends SparkSpec {

  private val O03Shape = """function profileEvents() {
    var out = {};
    records.ForEach(function(r) {
      var t = r.Meta("type");
      if (!out[t]) out[t] = [0, 0];
      out[t][0] += 1;
      out[t][1] += Math.round(r.Get(0) * 100);
    });
    return out;
  }
  function mergeProfiles(results) {
    var out = {};
    for (var i = 0; i < results.length; i++) {
      var p = results[i];
      if (p === null) continue;
      for (var k in p) {
        if (!out[k]) out[k] = [0, 0];
        out[k][0] += p[k][0];
        out[k][1] += p[k][1];
      }
    }
    return out;
  }"""

  private def eventsStore(n: Int, parts: Int = 8): RecordStore = {
    val types = Array("click", "view", "purchase", "signup")
    val recs = (0 until n).map { i =>
      SumRecord(i.toLong, Array((i * 0.37f) % 10f, i.toFloat),
        Map("type" -> types(i % types.length)))
    }
    RecordStore.fromRecords(spark, recs).repartitioned(parts)
  }

  private def compiled(code: String): JsOracle.Compiled =
    JsOracle.compileSource(code).fold(m => fail(s"compile failed: $m"), identity)

  /** Entry-shape acceptance probe: a canonical 1-slot merger is appended
    * so the verdict reflects the ENTRY's conformance, not the merger's.
    */
  private def accepts(code: String): Boolean =
    JsCatalyst.tryCompile(compiled(code + "\n" + mergerFor(1))).isDefined

  /** Both paths end-to-end on the same store; results must be equal as
    * JValues (both marshal through toJson's sorted-key rule).
    */
  private def crossCheck(code: String, store: RecordStore): JValue = {
    val c = compiled(code)
    val profile = JsCatalyst.tryCompile(c)
      .getOrElse(fail("expected the linear shape to transpile"))
    val partials = JsCatalyst.run(profile, store)
      .getOrElse(fail("expected no guard trip"))
    // One partial per partition, in partition order, like the scatter.
    assert(partials.length === store.records.rdd.getNumPartitions)
    val fast = JsOracle.runDistributed(1, code, store, Nil)
    val slow = JsOracle.runInterpreted(1, c, store, Nil)
    assert(slow.isRight, s"interpreter failed: $slow")
    assert(fast === slow)
    fast.toOption.get
  }

  test("o03's profileEvents shape: transpiled == interpreted, bit for bit") {
    val store = eventsStore(500)
    try {
      val merged = crossCheck(O03Shape, store)
      val obj = merged.asInstanceOf[JObject].obj.toMap
      assert(obj.keySet === Set("click", "view", "purchase", "signup"))
      // counts sum to the corpus
      val total = obj.values.map { case JArray(List(JInt(n), _)) => n.toLong }.sum
      assert(total === 500L)
    } finally store.close()
  }

  test("default merger falls back: its conflict error is decomposition-sensitive") {
    // Without a merge* hook the tri-state default merger REJECTS a key
    // defined by two partials — WHICH key conflicts first depends on how
    // rows landed in partitions, and a round-robin repartition assigns
    // rows differently under the typed and relational plan shapes (the
    // measured fact that forced the canonical-merger requirement). So
    // this shape must refuse to transpile, and both paths agree via the
    // interpreter.
    val code = """function countTypes() {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0];
        out[t][0] += 1;
      });
      return out;
    }"""
    val store = eventsStore(97, parts = 16)
    try {
      val c = compiled(code)
      assert(JsCatalyst.tryCompile(c).isEmpty)
      val fast = JsOracle.runDistributed(1, code, store, Nil)
      assert(fast.isLeft) // keys straddle partitions -> tri-state conflict
      assert(fast.swap.toOption.get.startsWith("merge conflict"))
    } finally store.close()
  }

  test("merger shape gate: only the canonical keyed-add fold transpiles") {
    val entry = """function count() {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0];
        out[t][0] += 1;
      });
      return out;
    }"""
    assert(JsCatalyst.tryCompile(compiled(entry + mergerFor(1))).isDefined)
    // scaled add is NOT the fold the partials were built for
    assert(JsCatalyst.tryCompile(compiled(entry + """
      function mergeScaled(results) {
        var out = {};
        for (var i = 0; i < results.length; i++) {
          var p = results[i];
          if (p === null) continue;
          for (var k in p) {
            if (!out[k]) out[k] = [0];
            out[k][0] += p[k][0] * 2;
          }
        }
        return out;
      }""")).isEmpty)
    // first-wins merger is decomposition-sensitive
    assert(JsCatalyst.tryCompile(compiled(entry + """
      function mergeFirst(results) {
        return results[0];
      }""")).isEmpty)
    // arity mismatch between entry buckets and merger buckets
    assert(JsCatalyst.tryCompile(compiled(entry + mergerFor(2))).isEmpty)
  }

  private def mergerFor(slots: Int): String = {
    val zeros = Seq.fill(slots)("0").mkString("[", ", ", "]")
    val adds = (0 until slots)
      .map(i => s"out[k][$i] += p[k][$i];").mkString("\n        ")
    s"""function mergeKeyed(results) {
      var out = {};
      for (var i = 0; i < results.length; i++) {
        var p = results[i];
        if (p === null) continue;
        for (var k in p) {
          if (!out[k]) out[k] = $zeros;
          $adds
        }
      }
      return out;
    }"""
  }

  test("conditional and arithmetic integer addends transpile and agree") {
    val code = s"""function profile() {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0, 0, 0];
        out[t][0] += r.Get(0) > 5 ? 1 : 0;
        out[t][1] += Math.floor(r.Get(1) / 2);
        out[t][2] += Math.min(r.Size, 2);
      });
      return out;
    }
    ${mergerFor(3)}"""
    val store = eventsStore(300)
    try crossCheck(code, store)
    finally store.close()
  }

  test("guard trip: out-of-range Get falls back and errors like the interpreter") {
    val code = """function badGet() {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0];
        out[t][0] += Math.round(r.Get(7));
      });
      return out;
    }
    """ + mergerFor(1)
    val store = eventsStore(20)
    try {
      val c = compiled(code)
      val profile = JsCatalyst.tryCompile(c)
      assert(profile.isDefined) // shape conforms...
      assert(JsCatalyst.run(profile.get, store).isEmpty) // ...but rows guard
      val fast = JsOracle.runDistributed(1, code, store, Nil)
      val slow = JsOracle.runInterpreted(1, c, store, Nil)
      assert(fast.isLeft && fast === slow) // same reference error wording
      assert(fast.swap.toOption.get.contains("index 7 out of range"))
    } finally store.close()
  }

  test("non-conforming shapes are refused (interpreter path)") {
    // float accumulation: result depends on add order — interpreter only
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0];
        out[t][0] += r.Get(0);
      });
      return out;
    }"""))
    // numeric key: JS stringifies "5", SQL casts "5.0"
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        if (!out[r.ID]) out[r.ID] = [0];
        out[r.ID][0] += 1;
      });
      return out;
    }"""))
    // update before bucket init would throw in JS
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        out[t][0] += 1;
        if (!out[t]) out[t] = [0];
      });
      return out;
    }"""))
    // records.All inside the callback is not a linear pass
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        var n = records.All().length;
        if (!out["k"]) out["k"] = [0];
        out["k"][0] += 1;
      });
      return out;
    }"""))
    // ctx side effects must run — refuse even when the local is unused
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        var unused = ctx.IsError();
        if (!out["k"]) out["k"] = [0];
        out["k"][0] += 1;
      });
      return out;
    }"""))
    // non-zero bucket init is not a sum identity
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        if (!out["k"]) out["k"] = [1];
        out["k"][0] += 1;
      });
      return out;
    }"""))
    // mismatched key expressions across statements
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        if (!out[r.Meta("a")]) out[r.Meta("a")] = [0];
        out[r.Meta("b")][0] += 1;
      });
      return out;
    }"""))
    // top-level statements could observe evaluation order
    assert(!accepts("""var seen = 0;
    function f() {
      var out = {};
      records.ForEach(function(r) {
        if (!out["k"]) out["k"] = [0];
        out["k"][0] += 1;
      });
      return out;
    }"""))
    // division by a non-literal divisor: x/0 is Inf in JS, null in SQL
    assert(!accepts("""function f() {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0];
        out[t][0] += Math.floor(r.Get(0) / r.Get(1));
      });
      return out;
    }"""))
  }

  test("entry params are fine as long as the callback never reads them") {
    val code = """function profile(threshold) {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0];
        out[t][0] += 1;
      });
      return out;
    }"""
    assert(accepts(code))
    // ...but reading one refuses (its value lives outside the row)
    assert(!accepts("""function profile(threshold) {
      var out = {};
      records.ForEach(function(r) {
        var t = r.Meta("type");
        if (!out[t]) out[t] = [0];
        out[t][0] += r.Get(0) > threshold ? 1 : 0;
      });
      return out;
    }"""))
  }
}
