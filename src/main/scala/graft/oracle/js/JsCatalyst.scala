package graft.oracle.js

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._

import graft.store.RecordStore
import JsLang._

/** JS→Catalyst transpile for the LINEAR ORACLE shape — the scan+aggregate
  * every profiling oracle in the reference's test corpus reduces to
  * (master/service_test.go:483-493's sumAllVectors family, o03's
  * profileEvents): a single `records.ForEach` whose callback does nothing
  * but keyed integer accumulation over `r.Get`/`r.Meta`/arithmetic.
  *
  * The tree-walking interpreter ([[JsInterp]]) is the COMPATIBILITY
  * surface — any ES5 program runs. But a conforming linear pass is a
  * groupBy-sum the engine already executes orders of magnitude faster
  * through whole-stage codegen, so [[JsOracle.runDistributed]] first
  * offers the parsed program here; anything outside the recognized shape
  * returns None and runs interpreted. Recognition is CONSERVATIVE by
  * construction — every accepted construct maps to a Catalyst expression
  * with bit-identical semantics:
  *
  *  - Entry body must be exactly `var acc = {};` +
  *    `records.ForEach(function(r){...});` + `return acc;`, with only
  *    function declarations at top level (top-level statements could
  *    observe evaluation order).
  *  - Callback statements: `var x = <expr>` locals (inlined by AST
  *    substitution), one `if (!acc[k]) acc[k] = [0,...,0];` bucket init
  *    (zeros only — the sum identity), and `acc[k][i] += <expr>` slot
  *    updates, every statement agreeing structurally on the key
  *    expression, updates only after the init (before it, the
  *    interpreter would throw on the undefined bucket).
  *  - Keys must be string-typed (`r.Meta(lit)` / string literals): a
  *    numeric JS key stringifies through numToStr ("5", not Spark's
  *    "5.0"), so numeric keys fall back rather than risk the delta.
  *  - Slot addends must be provably INTEGER-valued (`1`, `Math.round/
  *    floor/ceil(...)`, plus/minus/times closures over those, `r.Size`,
  *    `r.ID`):
  *    integer sums are associativity-exact, so per-partition partials
  *    match the interpreter's sequential fold bit-for-bit no matter how
  *    Spark associates the partial aggregation. Float accumulation
  *    (`+= r.Get(0)` bare) falls back — its result depends on add order,
  *    which only the interpreter reproduces. (Both paths share the
  *    IEEE-double exactness bound at 2^53, the same bound the
  *    reference's float64 accumulators have.)
  *  - `r.Get(i)` requires a whole non-negative literal index and emits a
  *    GUARD (`size(data) <= i`): the interpreter errors the run on an
  *    out-of-range Get where element_at would null-and-continue, so any
  *    guarded row aborts the transpiled run and the interpreter path
  *    reproduces the error faithfully.
  *
  * Execution mirrors the scatter shape: one groupBy
  * (spark_partition_id, key) aggregation — partial sums combine map-side,
  * the exchange carries partitions x keys rows — then per-partition
  * JSON partials (keys sorted, whole sums as JInt: [[JsInterp.toJson]]'s
  * exact rules) feed the SAME stored-merger path the interpreter feeds.
  * The stored merger must verify as the canonical keyed-add fold (see
  * [[tryCompile]]) because partition decomposition is plan-shape
  * dependent; the fold's associativity+commutativity over integer sums is
  * what makes the transpiled result equal the interpreter's for every
  * decomposition. JsCatalystSpec pins the interpreter cross-check on the
  * conforming corpus and the fallback on every non-conforming probe.
  */
object JsCatalyst {

  /** A compiled linear profile: string group key, integer-valued slot
    * addends, and the error guard (true on rows the interpreter would
    * fail on — a guarded run falls back so errors surface identically).
    */
  final case class LinearProfile(key: Column, slots: Seq[Column],
      guard: Option[Column])

  private final case class Abort() extends RuntimeException

  /** Offer the compiled oracle; None = not the transpilable shape.
    *
    * Beyond the entry's linear form, the stored `merge*` hook must be
    * the CANONICAL keyed-add fold (zero-init buckets, every slot
    * `out[k][i] += p[k][i]`, null partials skipped) — because a
    * round-robin `repartition` assigns rows to partitions differently
    * under the typed mapPartitions plan and the relational groupBy plan
    * (measured, not hypothetical: the same 97-record store decomposed
    * differently under the two plan shapes), per-partition partials are
    * NOT guaranteed to match the interpreter's partition-for-partition.
    * A canonical fold of integer sums is associative, commutative, and
    * zero-respecting, so EVERY decomposition merges to the same result;
    * any other merger — including the default tri-state merger, whose
    * key-conflict error depends on which partition saw a key first —
    * falls back to the interpreter.
    */
  def tryCompile(c: JsOracle.Compiled): Option[LinearProfile] = {
    val program = c.program
    if (!program.forall {
      case _: FuncDecl => true
      case _           => false
    }) return None
    val entry = program.collectFirst {
      case f: FuncDecl if f.name == c.entry => f
    }.getOrElse(return None)
    // A param shadowing the host would make `records` a data value.
    if (c.params.contains("records")) return None
    entry.body match {
      case Seq(
          VarDecl(Seq((acc, Some(ObjLit(Seq()))))),
          ExprStmt(Call(Member(Ident("records"), "ForEach"),
            Seq(FuncExpr(_, Seq(recParam), cb)))),
          Return(Some(Ident(ret))))
          if ret == acc && recParam != acc && recParam != "records" =>
        try {
          compileCallback(acc, recParam, cb).filter { profile =>
            c.merger.exists { m =>
              program.collectFirst {
                case f: FuncDecl if f.name == m.name => f
              }.exists(f => isCanonicalKeyedAdd(f, profile.slots.size))
            }
          }
        } catch { case Abort() => None }
      case _ => None
    }
  }

  /** Structural check: the merger is exactly the keyed-add fold —
    *
    * {{{
    * function mergeX(results) {
    *   var out = {};
    *   for (var i = 0; i < results.length; i++) {
    *     var p = results[i];
    *     if (p === null) continue;
    *     for (var k in p) {
    *       if (!out[k]) out[k] = [0, ..., 0];   // entry's arity
    *       out[k][0] += p[k][0]; ... ;          // every slot once
    *     }
    *   }
    *   return out;
    * }
    * }}}
    */
  private def isCanonicalKeyedAdd(f: FuncDecl, arity: Int): Boolean = {
    if (f.params.size != 1) return false
    val res = f.params.head
    f.body match {
      case Seq(
          VarDecl(Seq((out, Some(ObjLit(Seq()))))),
          For(
            Some(VarDecl(Seq((i1, Some(NumLit(0)))))),
            Some(Binary("<", Ident(i2), Member(Ident(r1), "length"))),
            Some(update),
            loopBody),
          Return(Some(Ident(ret))))
          if out != res && i1 == i2 && r1 == res && ret == out =>
        val updateOk = update match {
          case Update("++", Ident(i3), _)                  => i3 == i1
          case Assign("+=", Ident(i3), NumLit(1))          => i3 == i1
          case Assign("=", Ident(i3), Binary("+", Ident(i4), NumLit(1))) =>
            i3 == i1 && i4 == i1
          case _ => false
        }
        if (!updateOk) return false
        val stmts = loopBody match {
          case Block(ss) => ss
          case s         => Seq(s)
        }
        stmts match {
          case Seq(
              VarDecl(Seq((p1, Some(Index(Ident(r2), Ident(i5)))))),
              If(Binary("===", Ident(p2), NullLit), contS, None),
              ForIn(k, _, Ident(p3), inner))
              if r2 == res && i5 == i1 && p2 == p1 && p3 == p1 &&
                p1 != out =>
            val contOk = contS match {
              case ContinueStmt(None)             => true
              case Block(Seq(ContinueStmt(None))) => true
              case _                              => false
            }
            if (!contOk) return false
            val innerStmts = inner match {
              case Block(ss) => ss
              case s         => Seq(s)
            }
            innerStmts.toList match {
              case If(Unary("!", Index(Ident(o1), Ident(k1))), initS, None)
                  :: adds
                  if o1 == out && k1 == k =>
                val initOk = (initS match {
                  case ExprStmt(as: Assign)             => Some(as)
                  case Block(Seq(ExprStmt(as: Assign))) => Some(as)
                  case _                                => None
                }).exists {
                  case Assign("=", Index(Ident(o2), Ident(k2)), ArrLit(zs)) =>
                    o2 == out && k2 == k && zs.size == arity &&
                      zs.forall { case NumLit(0) => true; case _ => false }
                  case _ => false
                }
                val addSlots = adds.flatMap {
                  case ExprStmt(Assign("+=",
                      Index(Index(Ident(o3), Ident(k3)), NumLit(a)),
                      Index(Index(Ident(p4), Ident(k4)), NumLit(b))))
                      if o3 == out && k3 == k && p4 == p1 && k4 == k &&
                        a == b && a.isWhole =>
                    Some(a.toInt)
                  case _ => None
                }
                initOk && adds.size == arity &&
                  addSlots.toSet == (0 until arity).toSet
              case _ => false
            }
          case _ => false
        }
      case _ => false
    }
  }

  /** AST substitution of local `var` bindings, so structural equality of
    * key expressions survives `var t = r.Meta("type")` indirection.
    */
  private def subst(e: Expr, locals: Map[String, Expr]): Expr = e match {
    case Ident(n) if locals.contains(n) => locals(n)
    case Member(o, n)    => Member(subst(o, locals), n)
    case Index(o, i)     => Index(subst(o, locals), subst(i, locals))
    case Call(f, args)   => Call(subst(f, locals), args.map(subst(_, locals)))
    case Unary(op, x)    => Unary(op, subst(x, locals))
    case Binary(op, l, r)  => Binary(op, subst(l, locals), subst(r, locals))
    case Logical(op, l, r) => Logical(op, subst(l, locals), subst(r, locals))
    case Cond(c, t, f) =>
      Cond(subst(c, locals), subst(t, locals), subst(f, locals))
    case other => other
  }

  private def compileCallback(acc: String, r: String,
      body: Seq[Stmt]): Option[LinearProfile] = {
    var locals = Map.empty[String, Expr]
    var keyExpr: Option[Expr] = None // post-substitution, structural identity
    var arity = -1
    val slotAddends = scala.collection.mutable.Map.empty[Int, Expr]
    var guards = List.empty[Column]
    var inited = false

    def checkKey(k: Expr): Unit = {
      val s = subst(k, locals)
      keyExpr match {
        case None => keyExpr = Some(s)
        case Some(prev) => if (prev != s) throw Abort()
      }
    }

    body.foreach {
      case VarDecl(Seq((n, Some(init)))) =>
        if (n == acc || n == r || locals.contains(n)) throw Abort()
        locals += n -> subst(init, locals)
      case If(Unary("!", Index(Ident(a1), k1)), thenS, None) if a1 == acc =>
        val assign = thenS match {
          case ExprStmt(as: Assign)             => as
          case Block(Seq(ExprStmt(as: Assign))) => as
          case _                                => throw Abort()
        }
        assign match {
          case Assign("=", Index(Ident(a2), k2), ArrLit(zeros))
              if a2 == acc && zeros.nonEmpty &&
                zeros.forall { case NumLit(0) => true; case _ => false } =>
            if (inited) throw Abort() // one bucket shape per oracle
            checkKey(k1); checkKey(k2)
            arity = zeros.size
            inited = true
          case _ => throw Abort()
        }
      case ExprStmt(Assign("+=", Index(Index(Ident(a), k), NumLit(i)), v))
          if a == acc =>
        // Before the init the interpreter throws on the undefined bucket.
        if (!inited) throw Abort()
        checkKey(k)
        if (!i.isWhole || i < 0 || i >= arity) throw Abort()
        val slot = i.toInt
        if (slotAddends.contains(slot)) throw Abort()
        slotAddends(slot) = subst(v, locals)
      case _ => throw Abort()
    }

    if (!inited || keyExpr.isEmpty) throw Abort()
    // Every slot must be updated: an untouched slot stays 0 either way,
    // but requiring full coverage keeps the recognizer honest and simple.
    if (slotAddends.keySet != (0 until arity).toSet) throw Abort()

    def addGuard(g: Column): Unit = guards ::= g

    // Typed compile of a substituted expression into a Column.
    sealed trait T
    case object TStr extends T
    case object TBool extends T
    final case class TNum(isInt: Boolean) extends T

    def num(e: Expr): (Column, Boolean) = compile(e) match {
      case (c, TNum(i)) => (c, i)
      case _            => throw Abort()
    }
    def bool(e: Expr): Column = compile(e) match {
      case (c, TBool) => c
      case _          => throw Abort()
    }

    def compile(e: Expr): (Column, T) = e match {
      case NumLit(v)  => (lit(v), TNum(v.isWhole))
      case StrLit(s)  => (lit(s), TStr)
      case BoolLit(b) => (lit(b), TBool)
      case Member(Ident(`r`), "ID") | Member(Ident(`r`), "Id") =>
        (col("id").cast("double"), TNum(true))
      case Member(Ident(`r`), "Size") =>
        (size(col("data")).cast("double"), TNum(true))
      case Call(Member(Ident(`r`), "Get"), Seq(NumLit(i)))
          if i.isWhole && i >= 0 && i < Int.MaxValue =>
        // Out-of-range Get is a run error in the interpreter; the guard
        // detects it and the caller falls back so the error surfaces with
        // the reference wording. try_element_at (not element_at, which
        // throws under ANSI) keeps the scan alive long enough for the
        // guard aggregate to report.
        addGuard(col("data").isNull || size(col("data")) <= i.toInt)
        (try_element_at(col("data"), lit(i.toInt + 1)).cast("double"),
          TNum(false))
      case Call(Member(Ident(`r`), "Meta"), Seq(StrLit(k))) =>
        // Record.Meta: "" when absent (node/wrapper/record.go).
        (coalesce(try_element_at(col("meta"), lit(k)), lit("")), TStr)
      case Unary("-", x) =>
        val (c, i) = num(x); (-c, TNum(i))
      case Unary("+", x) =>
        val (c, i) = num(x); (c, TNum(i)) // numeric identity
      case Binary(op @ ("+" | "-" | "*"), l, rr) =>
        val (lc, li) = num(l); val (rc, ri) = num(rr)
        val c = op match {
          case "+" => lc + rc
          case "-" => lc - rc
          case _   => lc * rc
        }
        (c, TNum(li && ri))
      case Binary("/", l, rr) =>
        val (lc, _) = num(l); val (rc, _) = num(rr)
        // Spark double division by zero yields null where IEEE (and the
        // interpreter) yield Inf/NaN — only a non-zero LITERAL divisor
        // keeps the two engines bit-identical.
        rr match {
          case NumLit(d) if d != 0 => (lc / rc, TNum(false))
          case _                   => throw Abort()
        }
      case Binary("%", l, rr) =>
        val (lc, li) = num(l); val (rc, ri) = num(rr)
        // Same zero-divisor rule as "/": x % 0 is NaN in JS, null in SQL.
        rr match {
          case NumLit(d) if d != 0 => (lc % rc, TNum(li && ri))
          case _                   => throw Abort()
        }
      case Call(Member(Ident("Math"), "round"), Seq(x)) =>
        // JS Math.round = floor(x + 0.5) (JsOracle.baseEnv's exact rule).
        val (c, _) = num(x); (floor(c + lit(0.5)).cast("double"), TNum(true))
      case Call(Member(Ident("Math"), "floor"), Seq(x)) =>
        val (c, _) = num(x); (floor(c).cast("double"), TNum(true))
      case Call(Member(Ident("Math"), "ceil"), Seq(x)) =>
        val (c, _) = num(x); (ceil(c).cast("double"), TNum(true))
      case Call(Member(Ident("Math"), "abs"), Seq(x)) =>
        val (c, i) = num(x); (abs(c), TNum(i))
      case Call(Member(Ident("Math"), "sqrt"), Seq(x)) =>
        val (c, _) = num(x); (sqrt(c), TNum(false))
      case Call(Member(Ident("Math"), "min"), args) if args.size >= 2 =>
        val cs = args.map(num)
        (least(cs.map(_._1): _*), TNum(cs.forall(_._2)))
      case Call(Member(Ident("Math"), "max"), args) if args.size >= 2 =>
        val cs = args.map(num)
        (greatest(cs.map(_._1): _*), TNum(cs.forall(_._2)))
      case Cond(c, t, f) =>
        val cc = bool(c)
        val (tc, ti) = num(t); val (fc, fi) = num(f)
        (when(cc, tc).otherwise(fc), TNum(ti && fi))
      case Binary(op @ ("<" | "<=" | ">" | ">="), l, rr) =>
        val (lc, _) = num(l); val (rc, _) = num(rr)
        val c = op match {
          case "<"  => lc < rc
          case "<=" => lc <= rc
          case ">"  => lc > rc
          case _    => lc >= rc
        }
        (c, TBool)
      case Binary(op @ ("==" | "===" | "!=" | "!=="), l, rr) =>
        // Same-type operands only: mixed-type JS == coercion is a
        // minefield the recognizer refuses to enter.
        val (lc, lt) = compile(l); val (rc, rt) = compile(rr)
        val ok = (lt, rt) match {
          case (TNum(_), TNum(_)) => true
          case (TStr, TStr)       => true
          case _                  => false
        }
        if (!ok) throw Abort()
        (if (op.startsWith("!")) lc =!= rc else lc === rc, TBool)
      case Logical("&&", l, rr) => (bool(l) && bool(rr), TBool)
      case Logical("||", l, rr) => (bool(l) || bool(rr), TBool)
      case Unary("!", x)        => (!bool(x), TBool)
      case _ => throw Abort()
    }

    // Locals must compile even when unused: an unused `var x = <expr>`
    // still EVALUATES per record in the interpreter (and its Get guards
    // still fire there), so an uncompilable or effectful init aborts.
    locals.valuesIterator.foreach(e => compile(e))
    val (keyCol, keyT) = compile(keyExpr.get)
    if (keyT != TStr) throw Abort() // numeric keys stringify differently
    val slots = (0 until arity).map { i =>
      val (c, t) = compile(slotAddends(i))
      t match {
        case TNum(true) => c
        case _          => throw Abort() // float accumulation is order-defined
      }
    }
    Some(LinearProfile(keyCol,
      slots,
      guards.reduceOption(_ || _)))
  }

  /** The [[JsInterp.toJson]] whole-number rule, applied to a slot sum. */
  private def jsonNum(d: Double): JValue =
    if (d.isWhole && !d.isInfinite && math.abs(d) <= 9.007199254740992e15)
      JInt(BigInt(d.toLong))
    else JDouble(d)

  /** Execute the profile: ONE partial-aggregated groupBy over the store,
    * then per-partition JSON partials in partition order — exactly the
    * scatter the interpreter path produces, ready for the same merge
    * layer. None = a guard tripped (the interpreter would error this
    * run); the caller re-runs interpreted so the error surfaces with the
    * reference's exact message.
    */
  def run(p: LinearProfile, store: RecordStore): Option[Seq[JValue]] = {
    val df = store.records.toDF()
    val nParts = df.rdd.getNumPartitions
    val aggs =
      p.slots.zipWithIndex.map { case (c, i) => sum(c).as(s"__s$i") } :+
        max(p.guard.getOrElse(lit(false)).cast("int")).as("__guard")
    // spark_partition_id is nondeterministic, which grouping expressions
    // reject — project it first, exactly one evaluation per row.
    val rows = df
      .withColumn("__part", spark_partition_id())
      .groupBy(col("__part"), p.key.as("__key"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    if (rows.exists(r => r.getAs[Int]("__guard") == 1)) return None
    val byPart = rows.groupBy(_.getAs[Int]("__part"))
    Some((0 until nParts).map { pid =>
      val part = byPart.getOrElse(pid, Array.empty[org.apache.spark.sql.Row])
      JObject(part.map { row =>
        val key = row.getAs[String]("__key")
        key -> JArray(
          p.slots.indices.map(i => jsonNum(row.getAs[Double](s"__s$i"))).toList)
      }.sortBy(_._1).toList)
    })
  }
}
