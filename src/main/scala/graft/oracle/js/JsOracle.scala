package graft.oracle.js

import scala.collection.mutable

import org.json4s._

import graft.model.SumRecord
import graft.oracle.{Oracle, OracleContext, OracleRunError}
import graft.store.RecordStore
import JsInterp.{Env, toNum, toStr}
import JsLang._

/** Compile and run the reference's stored-JavaScript oracles for real.
  *
  * The reference compiles oracle code with otto (node/service/compiler.go):
  * parse, take the FIRST top-level function declaration as the entry
  * point (error "expected a function declaration" otherwise), run the
  * program once to surface definition-time errors (e.g. ReferenceError),
  * and record the declared parameter names. Each run then sets `records`,
  * `ctx` and the JSON-decoded args as globals on a fresh VM and calls the
  * entry function (node/service/compiled.go:44-99). A later top-level
  * function whose name starts with "merge" and that takes exactly one
  * argument is the distributed-merge hook (master/ast_raccoon.go:72-87).
  *
  * This is the same contract over [[JsInterp]]: per run, a fresh global
  * environment gets the host objects, the program re-executes (top-level
  * state therefore resets per run — the reference clones the compile-time
  * VM per run, which resets it the same way), and the entry call's result
  * is marshaled with Go's JSON conventions.
  *
  * One deliberate difference: `record.SetData` mutates only the oracle's
  * wrapper, never the store — graft's store is an immutable Dataset with
  * explicit update verbs, while the reference's wrapper aliases the
  * in-memory protobuf until the next flush. No reference test oracle
  * relies on SetData persistence.
  */
object JsOracle {

  final case class Compiled(entry: String, params: Seq[String],
      merger: Option[MergerDecl], program: Seq[Stmt])

  /** The `merge*` hook's name and its single declared parameter — the
    * reference sets the param as a VM GLOBAL before re-running the whole
    * program source (master/mux_runner.go:169-178), so top-level code can
    * see it; we replicate that binding order.
    */
  final case class MergerDecl(name: String, param: String)

  /** Parse + validate, mirroring the reference compiler's checks and its
    * error message for code with no function declaration
    * (node/service/compiler_test.go:15-19).
    */
  def compileSource(code: String): Either[String, Compiled] = {
    val program =
      try JsLang.parse(code)
      catch { case ParseError(m) => return Left(m) }
    val decls = program.collect { case f: FuncDecl => f }
    decls.headOption match {
      case None => Left("expected a function declaration")
      case Some(entry) =>
        // Definition-time run: no host globals, exactly like the
        // reference's compile-time vm.Run (records/ctx are set per run) —
        // `function imok(){} imnot = not_defined + 1;` rejects HERE.
        try {
          new JsInterp().exec(program, baseEnv())
        } catch {
          case JsThrow(v)        => return Left(JsInterp.throwMessage(v))
          case OracleRunError(m) => return Left(m)
          case graft.oracle.OracleBudgetError(m) => return Left(m)
          case e: Exception      => return Left(e.getMessage)
        }
        val merger = decls.drop(1)
          .find(f => f.name.startsWith("merge") && f.params.size == 1)
          .map(f => MergerDecl(f.name, f.params.head))
        Right(Compiled(entry.name, entry.params, merger, program))
    }
  }

  /** Compile to a registry [[Oracle]]: the body binds the store + context
    * as host globals and calls the entry function with the JSON args; the
    * merger (if declared) receives the array of partial results.
    */
  def compile(name: String, code: String): Either[String, Oracle] =
    compileSource(code).map { c =>
      Oracle(
        id = 0,
        name = name,
        params = c.params,
        body = (ctx, store, args) => {
          val interp = new JsInterp()
          val env = baseEnv()
          env.declare("records", recordsHost(interp, store))
          env.declare("ctx", ctxHost(ctx))
          try {
            interp.exec(c.program, env)
            c.params.zipWithIndex.foreach { case (p, i) =>
              env.declare(p, JsInterp.fromJson(
                args.lift(i).getOrElse(JNull)))
            }
            val entry = env.lookup(c.entry).getOrElse(
              throw OracleRunError(s"ReferenceError: '${c.entry}' is not defined"))
            val result = interp.callFunction(entry, c.params.map(p =>
              env.lookup(p).getOrElse(JsNull)))
            if (ctx.isError) JNull else JsInterp.toJson(result)
          } catch {
            // an uncaught JS `throw` fails the run with the thrown value's
            // export, like otto (a thrown string is the bare string)
            case JsThrow(v) => throw OracleRunError(JsInterp.throwMessage(v))
          }
        },
        merger = buildMerger(c),
        code = Some(code))
    }

  /** The merger closure, replicating the reference merger VM
    * (master/mux_runner.go:159-193): the partials array and `ctx` are
    * GLOBALS visible to the re-executed program, a ctx.Error inside the
    * merger fails the merge with "merger function failed: <msg>", and a
    * VM error fails it with "unable to run merger function: <err>".
    */
  private def buildMerger(c: Compiled): Option[Seq[JValue] => JValue] =
    c.merger.map { m => partials =>
      val interp = new JsInterp()
      val env = baseEnv()
      val ctx = new OracleContext
      val arr = new JsArr
      partials.foreach(p => arr.items += JsInterp.fromJson(p))
      env.declare(m.param, arr)
      env.declare("ctx", ctxHost(ctx))
      val result =
        try {
          interp.exec(c.program, env)
          val fn = env.lookup(m.name).getOrElse(
            throw OracleRunError(s"ReferenceError: '${m.name}' is not defined"))
          interp.callFunction(fn,
            Seq(env.lookup(m.param).getOrElse(arr)))
        } catch {
          case JsThrow(v) =>
            throw graft.oracle.Merge.MergerFailure(
              s"unable to run merger function: ${JsInterp.throwMessage(v)}")
          case OracleRunError(msg) =>
            throw graft.oracle.Merge.MergerFailure(
              s"unable to run merger function: $msg")
          case graft.oracle.OracleBudgetError(msg) =>
            throw graft.oracle.Merge.MergerFailure(
              s"unable to run merger function: $msg")
        }
      if (ctx.isError)
        throw graft.oracle.Merge.MergerFailure(
          s"merger function failed: ${ctx.message}")
      JsInterp.toJson(result)
    }

  /** Run the entry PER PARTITION on executors — graft's mapping of the
    * reference master's scatter-gather (master/mux_runner.go:82-155):
    * each Spark partition is a "node" whose `records` host exposes only
    * that partition's records, its JSON partial (or error) returns to the
    * driver, and the partials fold through the stored `merge*` hook or
    * the default tri-state merger. The driver-pull cap does NOT bound
    * this path — a partition materializes only inside its executor task,
    * never on the driver; only the compact JSON partial travels back.
    *
    * Per-node errors aggregate in the master's wire format:
    * "Errors from nodes: [error while running oracle <id>: <msg>, …]"
    * (master/mux_runner.go:120-151, pinned by service_test.go:660).
    */
  def runDistributed(id: Long, code: String, store: RecordStore,
      args: Seq[JValue]): Either[String, JValue] =
    compileSource(code).flatMap { c =>
      // Linear-shape fast path (JsCatalyst): a conforming scan+aggregate
      // oracle with a canonical keyed-add merger compiles to ONE
      // partial-aggregated groupBy instead of a per-record interpreter
      // walk; the merger's associative-commutative integer fold makes
      // the result decomposition-invariant, so it equals the
      // interpreter's bit for bit. A tripped guard (a row the
      // interpreter would error on) falls through to the interpreter so
      // the error surfaces with the reference wording.
      // GRAFT_JS_NO_TRANSPILE forces the interpreter for A/B runs and
      // the cross-check specs.
      val transpiled =
        if (sys.env.contains("GRAFT_JS_NO_TRANSPILE")) None
        else JsCatalyst.tryCompile(c)
          .flatMap(p => JsCatalyst.run(p, store))
      transpiled match {
        case Some(partials) => graft.oracle.Merge.merge(partials, buildMerger(c))
        case None           => runInterpreted(id, c, store, args)
      }
    }

  /** private[graft] so JsCatalystSpec can pin transpiled == interpreted
    * on the same stores without an env-var round trip.
    */
  private[graft] def runInterpreted(id: Long, c: Compiled, store: RecordStore,
      args: Seq[JValue]): Either[String, JValue] = {
      val program = c.program
      val params = c.params
      val entryName = c.entry
      val argVals: Seq[JValue] =
        params.indices.map(i => args.lift(i).getOrElse(JNull))
      val spark = store.records.sparkSession
      import spark.implicits._
      val partials: Seq[(Boolean, String)] =
        store.records.mapPartitions { it =>
          val interp = new JsInterp()
          val env = baseEnv()
          val ctx = new OracleContext
          // LAZY partition view: the partition materializes into executor
          // heap only if the oracle actually uses random access
          // (records.Find/All/AllBut — the reference node's all-in-memory
          // shape, node/storage/records.go). A records.ForEach-only oracle
          // streams the iterator directly, bounding memory at ONE record
          // regardless of partition size.
          var buffered: Vector[SumRecord] = null
          var streamed = false
          def all(): Seq[SumRecord] = {
            if (buffered == null) {
              if (streamed) throw OracleRunError(
                "records.ForEach already consumed this partition's " +
                  "stream; call Find/All/AllBut before ForEach, or use " +
                  "ForEach exclusively")
              buffered = it.toVector.sortBy(_.id)
            }
            buffered
          }
          def each(f: SumRecord => Unit): Unit =
            if (buffered != null) buffered.foreach(f)
            else if (streamed) throw OracleRunError(
              "records.ForEach already consumed this partition's stream")
            else { streamed = true; it.foreach(f) }
          env.declare("records", seqRecordsHost(interp,
            id => all().find(_.id == id), () => all(), Some(each)))
          env.declare("ctx", ctxHost(ctx))
          val out =
            try {
              interp.exec(program, env)
              params.zipWithIndex.foreach { case (p, i) =>
                env.declare(p, JsInterp.fromJson(argVals(i)))
              }
              val entry = env.lookup(entryName).getOrElse(throw OracleRunError(
                s"ReferenceError: '$entryName' is not defined"))
              val result = interp.callFunction(entry,
                params.map(p => env.lookup(p).getOrElse(JsNull)))
              if (ctx.isError) (false, ctx.message)
              else {
                val json = JsInterp.toJson(result)
                graft.oracle.Merge.firstNonFinite(json) match {
                  case Some(d) => (false, "json: unsupported value: " +
                    graft.oracle.Merge.nonFiniteRepr(d))
                  case None => (true, org.json4s.jackson.JsonMethods.compact(
                    org.json4s.jackson.JsonMethods.render(json)))
                }
              }
            } catch {
              case JsThrow(v)        => (false, JsInterp.throwMessage(v))
              case OracleRunError(m) => (false, m)
              case graft.oracle.OracleBudgetError(m) => (false, m)
              // Spark-internal failures must PROPAGATE: the partition
              // iterator is a shuffle read, and a FetchFailedException
              // thrown while the oracle consumes it is Spark's stage-retry
              // signal — reporting it as a per-node oracle error would
              // turn a transient, recoverable shuffle failure into a bogus
              // "Errors from nodes" query failure (harmless in local mode,
              // wrong on any cluster).
              case e if e.getClass.getName.startsWith("org.apache.spark") =>
                throw e
              // A defect in the interpreter/host layer (e.g. an
              // unanticipated java.time edge) must surface as the
              // reference's per-node error, not fail the Spark task with
              // a raw executor exception (master/mux_runner.go:120-151
              // wraps ANY node error the same way).
              case scala.util.control.NonFatal(e) =>
                (false, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
            }
          Iterator.single(out)
        }.collect().toSeq
      val errors = partials.collect { case (false, m) => m }
      if (errors.nonEmpty)
        Left("Errors from nodes: [" +
          errors.map(m => s"error while running oracle $id: $m")
            .mkString(", ") + "]")
      else {
        val vals = partials.map { case (_, s) =>
          org.json4s.jackson.JsonMethods.parse(s) }
        graft.oracle.Merge.merge(vals, buildMerger(c))
      }
    }

  // ----------------------------------------------------------- host: ctx
  private def ctxHost(ctx: OracleContext): JsHost =
    new JsHost("Context", Map(
      "Error" -> { args =>
        ctx.error(args.headOption.map(toStr).getOrElse(""))
        JsUndef
      },
      "IsError" -> { _ => JsBool(ctx.isError) },
      "Message" -> { _ => JsStr(ctx.message) }))

  // ------------------------------------------------------- host: records
  /** Driver-side `records` host over the whole store: Find is a Catalyst
    * point lookup; All/AllBut pull through the driver cap.
    */
  private def recordsHost(interp: JsInterp, store: RecordStore): JsHost = {
    def all(): Seq[SumRecord] = {
      import org.apache.spark.sql.functions.col
      val cap = RecordStore.maxCollectRows(store.records.sparkSession)
      val rows = store.records.orderBy(col("id")).limit(cap + 1).collect().toSeq
      if (rows.length > cap)
        throw OracleRunError(
          s"records.All() would materialize more than $cap rows on the " +
            "driver; raise graft.store.maxCollectRows, or run through " +
            "runDistributed where each partition materializes only on its " +
            "executor")
      rows
    }
    seqRecordsHost(interp, store.find, () => all())
  }

  /** The `records` host over a pluggable record view — the partition-local
    * form [[runDistributed]] builds on executors plugs a lazy view in here.
    * `eachFn` (when given) backs a streaming `records.ForEach(fn)` that
    * visits records one at a time WITHOUT materializing the view — the
    * scale path for linear-pass oracles; elsewhere ForEach folds over the
    * materialized view for API uniformity.
    */
  /** Step budget granted per record the host serves: the interpreter
    * budget then bounds work per record touched, not per run, so linear
    * passes scale with the corpus (JsInterp.grantSteps). 10k steps per
    * record is ~2 orders above a heavy per-record callback (a 64-dim
    * cosine in pure JS is ~500 steps).
    */
  private val StepsPerRecord = 10000L

  private def seqRecordsHost(interp: JsInterp,
      findFn: Long => Option[SumRecord],
      allFn: () => Seq[SumRecord],
      eachFn: Option[(SumRecord => Unit) => Unit] = None): JsHost = {
    def wrapSeq(recs: Seq[SumRecord]): JsArr = {
      interp.grantSteps(StepsPerRecord * recs.length)
      val a = new JsArr
      recs.foreach(r => a.items += recordHost(interp, Some(r)))
      a
    }
    new JsHost("Records", Map(
      "ForEach" -> { args =>
        val fn = args.headOption.getOrElse(
          throw OracleRunError("TypeError: undefined is not a function"))
        val visit: SumRecord => Unit = r => {
          interp.grantSteps(StepsPerRecord)
          interp.callFunction(fn, Seq(recordHost(interp, Some(r))))
          ()
        }
        eachFn match {
          case Some(each) => each(visit)
          case None       => allFn().foreach(visit)
        }
        JsUndef
      },
      "Find" -> { args =>
        val id = toNum(args.headOption.getOrElse(JsNum(0))).toLong
        recordHost(interp, findFn(id))
      },
      "All" -> { _ => wrapSeq(allFn()) },
      "AllBut" -> { args =>
        val excludeId = args.headOption match {
          case Some(h: JsHost) => h.props.get("ID").map(p => toNum(p()).toLong)
          case _               => None
        }
        wrapSeq(allFn().filterNot(r => excludeId.contains(r.id)))
      },
      "CreateRecord" -> { args =>
        // wrapper.Records.CreateRecord: wraps raw data WITHOUT storing it
        // (node/wrapper/records.go:60-66) — a scratch record for the
        // oracle's own math.
        val data = args.headOption match {
          case Some(a: JsArr) => a.items.map(v => toNum(v).toFloat).toArray
          case _              => Array.empty[Float]
        }
        recordHost(interp, Some(SumRecord(0L, data)))
      },
      "New" -> { args =>
        // wrapper.Records.New (node/wrapper/records.go:24-26): wrap a
        // record OBJECT without touching the store — the target of the
        // master's patched `records.New({...})` / `records.New(null)`
        // call sites (master/ast_raccoon.go:138-141). Null wraps the
        // null record (IsNull()==true), exactly WrapRecord(nil).
        recordHost(interp, args.headOption match {
          case Some(o: JsObj) => Some(objToRecord(o))
          case _              => None
        })
      }))
  }

  /** A JS record literal (`{id:…, data:[…], shape:[…], meta:{…}}` — the
    * JSON shape the master serialises resolved records into) back to a
    * [[SumRecord]]. Absent fields default like an empty protobuf record.
    */
  private def objToRecord(o: JsObj): SumRecord = {
    def arr(name: String): Seq[JsVal] = o.fields.get(name) match {
      case Some(a: JsArr) => a.items.toSeq
      case _              => Seq.empty
    }
    val data = arr("data").map(v => toNum(v).toFloat).toArray
    val shape0 = arr("shape").map(v => toNum(v).toLong).toArray
    val meta = o.fields.get("meta") match {
      case Some(m: JsObj) =>
        m.fields.map { case (k, v) => k -> toStr(v) }.toMap
      case _ => Map.empty[String, String]
    }
    SumRecord(
      o.fields.get("id").map(v => toNum(v).toLong).getOrElse(0L),
      data,
      if (shape0.nonEmpty) shape0 else Array(data.length.toLong),
      meta)
  }

  // -------------------------------------------------------- host: record
  /** Wrapped record, null-record included (Find miss → IsNull()==true,
    * node/wrapper/record.go:40-44). Math methods replicate record.go
    * exactly: double accumulation, the cosine zero-magnitude guard, the
    * m11/(m11+m10) jaccard with the (a+b)==1 mismatch rule.
    */
  private def recordHost(interp: JsInterp, rec0: Option[SumRecord]): JsHost = {
    // SetData re-wraps locally, so the data is a mutable cell
    var rec = rec0
    def dataOf(v: JsVal): Array[Float] = v match {
      case h: JsHost if h.hostName == "Record" =>
        h.props.get("__data").map(_()) match {
          case Some(a: JsArr) => a.items.map(x => toNum(x).toFloat).toArray
          case _ => throw OracleRunError("TypeError: null record")
        }
      case _ => throw OracleRunError("TypeError: expected a record")
    }
    def own(): Array[Float] = rec.map(_.data).getOrElse(
      throw OracleRunError("TypeError: null record"))
    def dotRange(a: Array[Float], b: Array[Float], start: Int, end: Int): Double = {
      var s = 0.0
      var i = start
      val hi = math.min(end, math.min(a.length, b.length))
      while (i < hi) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cosineOf(a: Array[Float], b: Array[Float], start: Int, end: Int): Double = {
      val aMag = math.sqrt(dotRange(a, a, start, end))
      val bMag = math.sqrt(dotRange(b, b, start, end))
      val den = aMag * bMag
      if (den == 0.0) 0.0 else dotRange(a, b, start, end) / den
    }
    def jaccardOf(a: Array[Float], b: Array[Float], start: Int, end: Int): Double = {
      var m11 = 0.0
      var m10 = 0.0
      var i = start
      val hi = math.min(end, math.min(a.length, b.length))
      while (i < hi) {
        m11 += (a(i) * b(i)).toDouble
        if (a(i) + b(i) == 1.0f) m10 += 1
        i += 1
      }
      if (m10 + m11 == 0) 0.0 else m11 / (m11 + m10)
    }
    def argNum(args: Seq[JsVal], i: Int): Int =
      toNum(args.lift(i).getOrElse(JsNum(0))).toInt

    new JsHost("Record",
      methods = Map(
        "IsNull" -> { _ => JsBool(rec.isEmpty) },
        "Is" -> { args =>
          val otherId = args.headOption match {
            case Some(h: JsHost) if h.hostName == "Record" =>
              h.props.get("__isnull").map(p => JsInterp.truthy(p())) match {
                case Some(true) => None
                case _ => h.props.get("ID").map(p => toNum(p()).toLong)
              }
            case _ => None
          }
          JsBool(rec.isDefined && otherId.contains(rec.get.id))
        },
        "SetData" -> { args =>
          val data = args.headOption match {
            case Some(a: JsArr) => a.items.map(v => toNum(v).toFloat).toArray
            case _              => Array.empty[Float]
          }
          rec = rec.map(r => r.copy(data = data))
            .orElse(Some(SumRecord(0L, data)))
          JsUndef
        },
        "Get" -> { args =>
          val data = own()
          val i = argNum(args, 0)
          if (i < 0 || i >= data.length)
            throw OracleRunError(s"index $i out of range")
          JsNum(data(i).toDouble)
        },
        "Meta" -> { args =>
          val key = args.headOption.map(toStr).getOrElse("")
          JsStr(rec.map(_.metaValue(key)).getOrElse(""))
        },
        "Equal" -> { args =>
          JsBool(own().sameElements(dataOf(args.head)))
        },
        "Dot" -> { args =>
          val b = dataOf(args.head)
          JsNum(dotRange(own(), b, 0, math.max(own().length, b.length)))
        },
        "DotRange" -> { args =>
          JsNum(dotRange(own(), dataOf(args.head), argNum(args, 1), argNum(args, 2)))
        },
        "DotSub" -> { args =>
          JsNum(dotRange(own(), dataOf(args.head), 0, argNum(args, 1)))
        },
        "Magnitude" -> { _ =>
          val d = own()
          JsNum(math.sqrt(dotRange(d, d, 0, d.length)))
        },
        "Cosine" -> { args =>
          val b = dataOf(args.head)
          JsNum(cosineOf(own(), b, 0, math.max(own().length, b.length)))
        },
        "CosineSub" -> { args =>
          JsNum(cosineOf(own(), dataOf(args.head), 0, argNum(args, 1)))
        },
        "CosineRange" -> { args =>
          JsNum(cosineOf(own(), dataOf(args.head), argNum(args, 1), argNum(args, 2)))
        },
        "Jaccard" -> { args =>
          val b = dataOf(args.head)
          JsNum(jaccardOf(own(), b, 0, math.max(own().length, b.length)))
        },
        "JaccardRange" -> { args =>
          JsNum(jaccardOf(own(), dataOf(args.head), argNum(args, 1), argNum(args, 2)))
        }),
      props = Map(
        "ID" -> (() => JsNum(rec.map(_.id.toDouble).getOrElse(0.0))),
        "Id" -> (() => JsNum(rec.map(_.id.toDouble).getOrElse(0.0))),
        "Size" -> (() => JsNum(rec.map(_.data.length.toDouble).getOrElse(0.0))),
        "__isnull" -> (() => JsBool(rec.isEmpty)),
        "__data" -> { () =>
          val a = new JsArr
          rec.foreach(_.data.foreach(f => a.items += JsNum(f.toDouble)))
          a
        }))
  }

  // ------------------------------------------------------------- globals
  /** The globals every VM gets: Math, and the handful of ES5 global
    * functions small oracles reach for.
    */
  private def baseEnv(): Env = {
    val env = new Env(None)
    val rnd = new java.util.Random(42) // deterministic Math.random
    def n1(name: String)(f: Double => Double): (String, Seq[JsVal] => JsVal) =
      name -> { args => JsNum(f(toNum(args.headOption.getOrElse(JsUndef)))) }
    env.declare("Math", new JsHost("Math",
      methods = Map(
        n1("sqrt")(math.sqrt), n1("abs")(math.abs),
        n1("floor")(math.floor), n1("ceil")(math.ceil),
        n1("round")(d => math.floor(d + 0.5)),
        n1("exp")(math.exp), n1("log")(math.log),
        n1("sin")(math.sin), n1("cos")(math.cos), n1("tan")(math.tan),
        n1("asin")(math.asin), n1("acos")(math.acos), n1("atan")(math.atan),
        "atan2" -> { args =>
          JsNum(math.atan2(toNum(args.head), toNum(args(1)))) },
        "pow" -> { args =>
          JsNum(math.pow(toNum(args.head), toNum(args(1)))) },
        "min" -> { args =>
          JsNum(if (args.isEmpty) Double.PositiveInfinity
                else args.map(toNum).min) },
        "max" -> { args =>
          JsNum(if (args.isEmpty) Double.NegativeInfinity
                else args.map(toNum).max) },
        "random" -> { _ => JsNum(rnd.nextDouble()) }),
      props = Map(
        "PI" -> (() => JsNum(math.Pi)),
        "E"  -> (() => JsNum(math.E)),
        "LN2"     -> (() => JsNum(math.log(2))),
        "LN10"    -> (() => JsNum(math.log(10))),
        "LOG2E"   -> (() => JsNum(1.0 / math.log(2))),
        "LOG10E"  -> (() => JsNum(1.0 / math.log(10))),
        "SQRT2"   -> (() => JsNum(math.sqrt(2))),
        "SQRT1_2" -> (() => JsNum(math.sqrt(0.5))))))
    env.declare("JSON", new JsHost("JSON", Map(
      "parse" -> { args =>
        val raw = toStr(args.headOption.getOrElse(JsUndef))
        try JsInterp.fromJson(org.json4s.jackson.JsonMethods.parse(raw))
        catch {
          case e: Exception =>
            throw OracleRunError(s"SyntaxError: ${e.getMessage}")
        }
      },
      "stringify" -> { args =>
        // the 2nd (replacer) argument is accepted and ignored; the 3rd is
        // the ES5 space argument (number of spaces, capped at 10, or a
        // literal indent string)
        val indent = args.lift(2) match {
          case Some(JsNum(d)) if d >= 1 => " " * math.min(10, d.toInt)
          case Some(JsStr(s))           => s.take(10)
          case _                        => ""
        }
        JsInterp.jsonStringify(args.headOption.getOrElse(JsUndef), indent)
          .map(JsStr(_)).getOrElse(JsUndef)
      })))
    env.declare("Object", new JsHost("Object", Map(
      "keys" -> { args =>
        val a = new JsArr
        args.headOption match {
          case Some(o: JsObj) =>
            // OWN ENUMERABLE keys only (ES5 15.2.3.14): inherited ones are
            // for-in's business, and the auto-seeded `constructor` on a
            // default function prototype is non-enumerable
            o.fields.keys.foreach(k =>
              if (!o.nonEnumerable.contains(k)) a.items += JsStr(k))
          case Some(arr: JsArr) => arr.items.indices.foreach(i => a.items += JsStr(i.toString))
          case _ => ()
        }
        a
      })))
    // ES5 15.1.3 URI handling: encode over UTF-8 bytes with the spec's
    // unescaped sets; decode rejects malformed %-sequences with URIError.
    val uriMark = "-_.!~*'()"
    val uriReserved = ";/?:@&=+$,#"
    def uriEncode(name: String, keep: String) =
      new JsNative(name, 1, { args =>
        val s = toStr(args.headOption.getOrElse(JsUndef))
        val sb = new StringBuilder
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
          val c = (b & 0xff).toChar
          if (c.isLetterOrDigit && c < 128 || keep.indexOf(c) >= 0)
            sb.append(c)
          else sb.append(f"%%${b & 0xff}%02X")
        }
        JsStr(sb.toString)
      })
    def uriDecode(name: String, keepEncoded: String) =
      new JsNative(name, 1, { args =>
        val s = toStr(args.headOption.getOrElse(JsUndef))
        val bytes = new java.io.ByteArrayOutputStream
        // STRICT hex digits only: Integer.parseInt would accept "+f"
        // (signed hex), which ES5 15.1.3 rejects as URIError
        def hexDigit(c: Char): Boolean =
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
          (c >= 'A' && c <= 'F')
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '%') {
            if (i + 3 > s.length ||
                !hexDigit(s.charAt(i + 1)) || !hexDigit(s.charAt(i + 2)))
              throw OracleRunError("URIError: URI malformed")
            val hex = s.substring(i + 1, i + 3)
            val v = Integer.parseInt(hex, 16)
            // decodeURI keeps reserved characters percent-encoded
            if (v < 128 && keepEncoded.indexOf(v.toChar) >= 0) {
              bytes.write('%'); bytes.write(hex.charAt(0))
              bytes.write(hex.charAt(1))
            } else bytes.write(v)
            i += 3
          } else {
            bytes.write(c.toString
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            i += 1
          }
        }
        // Invalid UTF-8 percent-sequences (e.g. a lone %FF) are URIError
        // in ES5/otto, not U+FFFD replacement — decode REPORTing failures.
        val decoder = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        val out =
          try decoder.decode(java.nio.ByteBuffer.wrap(bytes.toByteArray))
          catch { case _: java.nio.charset.CharacterCodingException =>
            throw OracleRunError("URIError: URI malformed") }
        JsStr(out.toString)
      })
    env.declare("encodeURIComponent", uriEncode("encodeURIComponent", uriMark))
    env.declare("encodeURI", uriEncode("encodeURI", uriMark + uriReserved))
    env.declare("decodeURIComponent", uriDecode("decodeURIComponent", ""))
    env.declare("decodeURI", uriDecode("decodeURI", uriReserved))
    env.declare("isNaN", new JsNative("isNaN", 1,
      args => JsBool(toNum(args.headOption.getOrElse(JsUndef)).isNaN)))
    env.declare("isFinite", new JsNative("isFinite", 1, { args =>
      val d = toNum(args.headOption.getOrElse(JsUndef))
      JsBool(!d.isNaN && !d.isInfinite)
    }))
    // Constructible globals: `new X(...)` is special-cased by the
    // interpreter; these bindings make the plain-call forms (`Error(m)`,
    // `Array(1,2)`, `Boolean(v)`) and `instanceof X` work too.
    Seq("Error", "TypeError", "RangeError", "SyntaxError",
        "ReferenceError", "EvalError", "URIError").foreach { nm =>
      env.declare(nm, new JsNative(nm, 1, args =>
        JsInterp.errorObj(nm, args.headOption.map(toStr).getOrElse(""))))
    }
    env.declare("Array", new JsNative("Array", -1,
      args => {
        val a = new JsArr
        args match {
          case Seq(JsNum(d)) =>
            // ES5 15.4.2.2: a single numeric argument is the LENGTH and
            // must be an integer below 2^32 — otherwise RangeError
            // (Array(1e308) used to saturate .toInt and die in a raw
            // 2^31-element allocation; caught by JsFuzzSpec seed 5597).
            if (!d.isWhole || d < 0 || d >= 4294967296.0)
              throw JsThrow(JsInterp.errorObj("RangeError",
                "Invalid array length"))
            // Valid-but-huge lengths are an engine memory bound, named
            // like the driver-pull caps (a 2^31-slot pre-allocation is
            // node death, and otto's Go panic recovery is per-RPC; here
            // the bound fails the RUN, loudly).
            if (d > 16777216.0)
              throw OracleRunError(s"Array length ${JsInterp.numToStr(d)} " +
                "exceeds the engine bound of 16777216 elements")
            (0 until d.toInt).foreach(_ => a.items += JsUndef)
          case _ => args.foreach(a.items += _)
        }
        a
      },
      statics = Map("isArray" -> new JsNative("isArray", 1,
        args => JsBool(args.headOption.exists(_.isInstanceOf[JsArr]))))))
    env.declare("Boolean", new JsNative("Boolean", 1,
      args => JsBool(JsInterp.truthy(args.headOption.getOrElse(JsUndef)))))
    // `new Date(...)` is interpreter-special-cased; this binding carries
    // the statics, `instanceof Date`, and the ES5 plain-call form (which
    // ignores its arguments and returns the current time as a string)
    env.declare("Date", new JsNative("Date", -1,
      _ => JsStr(JsInterp.toStr(
        new JsDate(System.currentTimeMillis.toDouble))),
      statics = Map(
        "now" -> new JsNative("now", 0,
          _ => JsNum(System.currentTimeMillis.toDouble)),
        "parse" -> new JsNative("parse", 1, args =>
          JsNum(JsInterp.dateParse(
            JsInterp.toStr(args.headOption.getOrElse(JsUndef))))),
        "UTC" -> new JsNative("UTC", -1, args =>
          JsNum(JsInterp.dateFromFields(args.map(JsInterp.toNum)))))))
    env.declare("RegExp", new JsNative("RegExp", 2, args =>
      args.headOption match {
        case Some(re: JsRegex) => re // RegExp(re) returns it unchanged
        case other => JsInterp.mkRegex(other.map(toStr).getOrElse(""),
          args.lift(1).map(toStr).getOrElse(""))
      }))
    env.declare("parseInt", new JsNative("parseInt", 2, { args =>
      // ES5 15.1.2.2: optional sign only at position 0, then an optional
      // 0x/0X prefix (radix absent or 16) switching to hex, then the
      // longest digit prefix valid in the radix; empty -> NaN.
      var s = toStr(args.headOption.getOrElse(JsUndef)).trim
      var sign = 1.0
      if (s.startsWith("-")) { sign = -1.0; s = s.substring(1) }
      else if (s.startsWith("+")) s = s.substring(1)
      var radix = args.lift(1).map(v => toNum(v).toInt).filter(_ != 0).getOrElse(0)
      if ((radix == 0 || radix == 16) &&
          (s.startsWith("0x") || s.startsWith("0X"))) {
        s = s.substring(2); radix = 16
      }
      if (radix == 0) radix = 10
      val m = s.takeWhile(c => Character.digit(c, radix) >= 0)
      if (m.isEmpty || radix < 2 || radix > 36) JsNum(Double.NaN)
      else {
        // digit-by-digit (not parseLong) so huge literals saturate into
        // doubles instead of overflowing
        var acc = 0.0
        m.foreach(c => acc = acc * radix + Character.digit(c, radix))
        JsNum(sign * acc)
      }
    }))
    env.declare("parseFloat", new JsNative("parseFloat", 1, { args =>
      val s = toStr(args.headOption.getOrElse(JsUndef)).trim
      val m = "^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?".r.findFirstIn(s)
      JsNum(m.map(_.toDouble).getOrElse(Double.NaN))
    }))
    env.declare("String", new JsNative("String", 1,
      args => JsStr(args.headOption.map(toStr).getOrElse("")),
      statics = Map("fromCharCode" -> new JsNative("fromCharCode", -1,
        args => JsStr(args.map(v => toNum(v).toChar).mkString)))))
    env.declare("Number", new JsNative("Number", 1,
      args => JsNum(args.headOption.map(toNum).getOrElse(0.0)),
      statics = Map(
        "MAX_VALUE" -> JsNum(Double.MaxValue),
        "MIN_VALUE" -> JsNum(java.lang.Double.MIN_VALUE),
        "POSITIVE_INFINITY" -> JsNum(Double.PositiveInfinity),
        "NEGATIVE_INFINITY" -> JsNum(Double.NegativeInfinity),
        "NaN" -> JsNum(Double.NaN))))
    env
  }
}
