package graft.oracle.js

import scala.collection.mutable

import org.json4s._

import graft.oracle.OracleRunError
import JsLang._

/** Runtime values for the oracle JS subset. Numbers are IEEE doubles,
  * objects are insertion-ordered string maps, arrays are growable — the
  * semantics the reference's otto VM gives its oracles.
  */
sealed trait JsVal
final case class JsNum(v: Double) extends JsVal
final case class JsStr(s: String) extends JsVal
final case class JsBool(b: Boolean) extends JsVal
case object JsNull extends JsVal
case object JsUndef extends JsVal
final class JsObj(val fields: mutable.LinkedHashMap[String, JsVal] =
    mutable.LinkedHashMap.empty) extends JsVal
final class JsArr(val items: mutable.ArrayBuffer[JsVal] =
    mutable.ArrayBuffer.empty) extends JsVal
final class JsFunc(val name: Option[String], val params: Seq[String],
    val body: Seq[Stmt], val closure: JsInterp.Env) extends JsVal
final class JsNative(val name: String, val arity: Int,
    val fn: Seq[JsVal] => JsVal) extends JsVal
/** A host object: named methods plus read-only properties (the wrapped
  * `records`/`ctx`/record objects the reference exposes to oracles).
  */
final class JsHost(val hostName: String,
    val methods: Map[String, Seq[JsVal] => JsVal],
    val props: Map[String, () => JsVal] = Map.empty) extends JsVal

/** Tree-walking evaluator with JS coercion semantics for the subset
  * [[JsLang]] parses. Each run is budgeted (`maxSteps`) so a stored
  * oracle with an accidental infinite loop cannot wedge a serving
  * thread — the reference relies on gRPC deadlines for the same hazard.
  *
  * Scoping is ES5 `var`: only function calls (and the program itself)
  * create scopes, blocks do not; function DECLARATIONS hoist to the top
  * of their scope; assignment to an undeclared name creates a global
  * (non-strict mode), which the reference's oracles rely on
  * (master/service_test.go:381 `result = {};`).
  */
final class JsInterp(maxSteps: Long = 50_000_000L) {
  import JsInterp._

  private var steps = 0L

  private def tick(): Unit = {
    steps += 1
    if (steps > maxSteps)
      throw OracleRunError(s"oracle exceeded the $maxSteps-step budget")
  }

  private final case class ReturnSignal(v: JsVal) extends RuntimeException
    with scala.util.control.NoStackTrace
  private final case class BreakSignal() extends RuntimeException
    with scala.util.control.NoStackTrace
  private final case class ContinueSignal() extends RuntimeException
    with scala.util.control.NoStackTrace

  // ------------------------------------------------------------- driving
  /** Execute a program in `env`: hoist function declarations, run the
    * statements.
    */
  def exec(stmts: Seq[Stmt], env: Env): Unit = {
    hoist(stmts, env)
    stmts.foreach(stmt(_, env))
  }

  private def hoist(stmts: Seq[Stmt], env: Env): Unit =
    stmts.foreach {
      case FuncDecl(nm, ps, body) =>
        env.declare(nm, new JsFunc(Some(nm), ps, body, env))
      case _ => ()
    }

  def callFunction(f: JsVal, args: Seq[JsVal]): JsVal = f match {
    case fn: JsFunc =>
      tick()
      val frame = new Env(Some(fn.closure))
      fn.params.zipWithIndex.foreach { case (p, i) =>
        frame.declare(p, if (i < args.length) args(i) else JsUndef)
      }
      fn.name.foreach(nm => if (!frame.has(nm)) frame.declare(nm, fn))
      try {
        hoist(fn.body, frame)
        fn.body.foreach(stmt(_, frame))
        JsUndef
      } catch { case ReturnSignal(v) => v }
    case nf: JsNative => tick(); nf.fn(args)
    case other =>
      throw OracleRunError(s"TypeError: ${typeOf(other)} is not a function")
  }

  // ----------------------------------------------------------- statements
  private def stmt(s: Stmt, env: Env): Unit = {
    tick()
    s match {
      case EmptyStmt       => ()
      case _: FuncDecl     => () // hoisted
      case ExprStmt(e)     => eval(e, env); ()
      case VarDecl(decls) =>
        decls.foreach { case (nm, init) =>
          val v = init.map(eval(_, env)).getOrElse(JsUndef)
          env.declare(nm, v)
        }
      case Block(stmts) =>
        hoist(stmts, env)
        stmts.foreach(stmt(_, env))
      case If(c, t, e) =>
        if (truthy(eval(c, env))) stmt(t, env) else e.foreach(stmt(_, env))
      case While(c, body) =>
        while (truthy(eval(c, env))) {
          try stmt(body, env)
          catch {
            case _: ContinueSignal => ()
            case _: BreakSignal    => return
          }
        }
      case DoWhile(body, c) =>
        var go = true
        while (go) {
          try stmt(body, env)
          catch {
            case _: ContinueSignal => ()
            case _: BreakSignal    => return
          }
          go = truthy(eval(c, env))
        }
      case For(init, cond, upd, body) =>
        init.foreach(stmt(_, env))
        while (cond.forall(c => truthy(eval(c, env)))) {
          try stmt(body, env)
          catch {
            case _: ContinueSignal => ()
            case _: BreakSignal    => return
          }
          upd.foreach(eval(_, env))
        }
      case ForIn(nm, declare, objE, body) =>
        if (declare && !env.has(nm)) env.declare(nm, JsUndef)
        val keys: Seq[String] = eval(objE, env) match {
          case o: JsObj => o.fields.keys.toSeq
          case a: JsArr => a.items.indices.map(_.toString)
          case _        => Seq.empty
        }
        keys.foreach { k =>
          assignTo(Ident(nm), JsStr(k), env)
          try stmt(body, env)
          catch {
            case _: ContinueSignal => ()
            case _: BreakSignal    => return
          }
        }
      case Return(e) =>
        throw ReturnSignal(e.map(eval(_, env)).getOrElse(JsUndef))
      case BreakStmt    => throw BreakSignal()
      case ContinueStmt => throw ContinueSignal()
    }
  }

  // ---------------------------------------------------------- expressions
  def eval(e: Expr, env: Env): JsVal = {
    tick()
    e match {
      case NumLit(v)  => JsNum(v)
      case StrLit(s)  => JsStr(s)
      case BoolLit(b) => JsBool(b)
      case NullLit    => JsNull
      case Ident("undefined") => JsUndef
      case Ident("NaN")       => JsNum(Double.NaN)
      case Ident("Infinity")  => JsNum(Double.PositiveInfinity)
      case Ident(nm) =>
        env.lookup(nm).getOrElse(
          throw OracleRunError(s"ReferenceError: '$nm' is not defined"))
      case ArrLit(items) =>
        val a = new JsArr
        items.foreach(it => a.items += eval(it, env))
        a
      case ObjLit(fields) =>
        val o = new JsObj
        fields.foreach { case (k, v) => o.fields(k) = eval(v, env) }
        o
      case FuncExpr(nm, ps, body) => new JsFunc(nm, ps, body, env)
      case Member(objE, nm)       => getMember(eval(objE, env), nm)
      case Index(objE, idxE) =>
        val obj = eval(objE, env)
        val idx = eval(idxE, env)
        getIndexed(obj, idx)
      case Call(fnE, argEs) =>
        val args = argEs.map(eval(_, env))
        fnE match {
          // method call: dispatch on the receiver so host methods and
          // array/string builtins see their object
          case Member(objE, nm) =>
            val obj = eval(objE, env)
            callMethod(obj, nm, args)
          case Index(objE, idxE) =>
            val obj = eval(objE, env)
            val nm = toStr(eval(idxE, env))
            callMethod(obj, nm, args)
          case _ => callFunction(eval(fnE, env), args)
        }
      case Unary(op, inner) =>
        op match {
          case "-" => JsNum(-toNum(eval(inner, env)))
          case "+" => JsNum(toNum(eval(inner, env)))
          case "!" => JsBool(!truthy(eval(inner, env)))
          case "~" => JsNum((~toInt32(eval(inner, env))).toDouble)
          case "void" => eval(inner, env); JsUndef
          case "typeof" =>
            val v = inner match {
              case Ident(nm) => env.lookup(nm).getOrElse(JsUndef)
              case other     => eval(other, env)
            }
            JsStr(typeOf(v))
        }
      case Update(op, target, prefix) =>
        val old = toNum(eval(target, env))
        val nv = if (op == "++") old + 1 else old - 1
        assignTo(target, JsNum(nv), env)
        JsNum(if (prefix) nv else old)
      case Binary(op, l, r) => binary(op, eval(l, env), eval(r, env))
      case Logical("&&", l, r) =>
        val lv = eval(l, env)
        if (!truthy(lv)) lv else eval(r, env)
      case Logical("||", l, r) =>
        val lv = eval(l, env)
        if (truthy(lv)) lv else eval(r, env)
      case Logical(op, _, _) =>
        throw OracleRunError(s"unsupported logical operator $op")
      case Cond(c, t, f) =>
        if (truthy(eval(c, env))) eval(t, env) else eval(f, env)
      case Assign("=", target, value) =>
        val v = eval(value, env)
        assignTo(target, v, env)
        v
      case Assign(op, target, value) =>
        val cur = eval(target, env)
        val v = binary(op.stripSuffix("="), cur, eval(value, env))
        assignTo(target, v, env)
        v
      case Comma(l, r) => eval(l, env); eval(r, env)
    }
  }

  private def assignTo(target: Expr, v: JsVal, env: Env): Unit = target match {
    case Ident(nm) => env.assign(nm, v) // undeclared -> global (non-strict)
    case Member(objE, nm) =>
      eval(objE, env) match {
        case o: JsObj => o.fields(nm) = v
        case a: JsArr if nm == "length" =>
          val n = toNum(v).toInt
          if (n < a.items.length) a.items.remove(n, a.items.length - n)
          else while (a.items.length < n) a.items += JsUndef
        case other =>
          throw OracleRunError(
            s"TypeError: cannot set property '$nm' of ${typeOf(other)}")
      }
    case Index(objE, idxE) =>
      val obj = eval(objE, env)
      val idx = eval(idxE, env)
      obj match {
        case a: JsArr =>
          val i = toNum(idx).toInt
          if (i >= 0) {
            while (a.items.length <= i) a.items += JsUndef
            a.items(i) = v
          }
        case o: JsObj => o.fields(toStr(idx)) = v
        case other =>
          throw OracleRunError(
            s"TypeError: cannot set index of ${typeOf(other)}")
      }
    case _ => throw OracleRunError("invalid assignment target")
  }

  // -------------------------------------------------- member/index access
  private def getMember(obj: JsVal, nm: String): JsVal = obj match {
    case o: JsObj => o.fields.getOrElse(nm, JsUndef)
    case a: JsArr =>
      if (nm == "length") JsNum(a.items.length)
      else arrayMethod(a, nm).getOrElse(JsUndef)
    case s: JsStr =>
      if (nm == "length") JsNum(s.s.length)
      else stringMethod(s.s, nm).getOrElse(JsUndef)
    case h: JsHost =>
      h.props.get(nm).map(_())
        .orElse(h.methods.get(nm).map(m =>
          new JsNative(s"${h.hostName}.$nm", -1, m)))
        .getOrElse(JsUndef)
    case JsNull | JsUndef =>
      throw OracleRunError(
        s"TypeError: cannot read property '$nm' of ${typeOf(obj)}")
    case _ => JsUndef
  }

  private def getIndexed(obj: JsVal, idx: JsVal): JsVal = obj match {
    case a: JsArr =>
      idx match {
        case JsNum(d) if d.isWhole =>
          val i = d.toInt
          if (i >= 0 && i < a.items.length) a.items(i) else JsUndef
        case _ => getMember(a, toStr(idx))
      }
    case o: JsObj => o.fields.getOrElse(toStr(idx), JsUndef)
    case s: JsStr =>
      idx match {
        case JsNum(d) if d.isWhole && d >= 0 && d < s.s.length =>
          JsStr(s.s.charAt(d.toInt).toString)
        case _ => getMember(s, toStr(idx))
      }
    case _ => getMember(obj, toStr(idx))
  }

  private def callMethod(obj: JsVal, nm: String, args: Seq[JsVal]): JsVal =
    obj match {
      case h: JsHost =>
        h.methods.get(nm) match {
          case Some(m) => tick(); m(args)
          case None =>
            h.props.get(nm).map(_()) match {
              case Some(f) => callFunction(f, args)
              case None =>
                throw OracleRunError(
                  s"TypeError: '$nm' is not a function on ${h.hostName}")
            }
        }
      case a: JsArr =>
        arrayMethod(a, nm) match {
          case Some(nf: JsNative) => tick(); nf.fn(args)
          case _ => callFunction(getMember(obj, nm), args)
        }
      case s: JsStr =>
        stringMethod(s.s, nm) match {
          case Some(nf: JsNative) => tick(); nf.fn(args)
          case _ => callFunction(getMember(obj, nm), args)
        }
      case _ => callFunction(getMember(obj, nm), args)
    }

  // ------------------------------------------------------ array builtins
  private def arrayMethod(a: JsArr, nm: String): Option[JsNative] = nm match {
    case "push" => Some(new JsNative("push", -1, args => {
      args.foreach(a.items += _)
      JsNum(a.items.length)
    }))
    case "pop" => Some(new JsNative("pop", 0, _ =>
      if (a.items.isEmpty) JsUndef else a.items.remove(a.items.length - 1)))
    case "forEach" => Some(new JsNative("forEach", 1, args => {
      val f = args.head
      a.items.zipWithIndex.foreach { case (v, i) =>
        callFunction(f, Seq(v, JsNum(i), a))
      }
      JsUndef
    }))
    case "map" => Some(new JsNative("map", 1, args => {
      val f = args.head
      val out = new JsArr
      a.items.zipWithIndex.foreach { case (v, i) =>
        out.items += callFunction(f, Seq(v, JsNum(i), a))
      }
      out
    }))
    case "filter" => Some(new JsNative("filter", 1, args => {
      val f = args.head
      val out = new JsArr
      a.items.zipWithIndex.foreach { case (v, i) =>
        if (truthy(callFunction(f, Seq(v, JsNum(i), a)))) out.items += v
      }
      out
    }))
    case "reduce" => Some(new JsNative("reduce", -1, args => {
      val f = args.head
      var (acc, start) =
        if (args.length > 1) (args(1), 0)
        else if (a.items.nonEmpty) (a.items.head, 1)
        else throw OracleRunError("TypeError: reduce of empty array with no initial value")
      (start until a.items.length).foreach { i =>
        acc = callFunction(f, Seq(acc, a.items(i), JsNum(i), a))
      }
      acc
    }))
    case "indexOf" => Some(new JsNative("indexOf", 1, args =>
      JsNum(a.items.indexWhere(strictEquals(_, args.head)).toDouble)))
    case "join" => Some(new JsNative("join", 1, args => {
      val sep = args.headOption.map(toStr).getOrElse(",")
      JsStr(a.items.map {
        case JsNull | JsUndef => ""
        case v                => toStr(v)
      }.mkString(sep))
    }))
    case "slice" => Some(new JsNative("slice", -1, args => {
      val n = a.items.length
      def clamp(d: Double): Int =
        if (d < 0) math.max(0, n + d.toInt) else math.min(n, d.toInt)
      val from = args.headOption.map(v => clamp(toNum(v))).getOrElse(0)
      val until = args.lift(1).map(v => clamp(toNum(v))).getOrElse(n)
      val out = new JsArr
      if (from < until) a.items.slice(from, until).foreach(out.items += _)
      out
    }))
    case "concat" => Some(new JsNative("concat", -1, args => {
      val out = new JsArr
      a.items.foreach(out.items += _)
      args.foreach {
        case other: JsArr => other.items.foreach(out.items += _)
        case v            => out.items += v
      }
      out
    }))
    case "sort" => Some(new JsNative("sort", -1, args => {
      val sorted = args.headOption match {
        case Some(f @ (_: JsFunc | _: JsNative)) =>
          a.items.sortWith((x, y) => toNum(callFunction(f, Seq(x, y))) < 0)
        case _ => a.items.sortBy(toStr)
      }
      a.items.clear(); sorted.foreach(a.items += _)
      a
    }))
    case _ => None
  }

  // ----------------------------------------------------- string builtins
  private def stringMethod(s: String, nm: String): Option[JsNative] = nm match {
    case "charAt" => Some(new JsNative("charAt", 1, args => {
      val i = toNum(args.headOption.getOrElse(JsNum(0))).toInt
      JsStr(if (i >= 0 && i < s.length) s.charAt(i).toString else "")
    }))
    case "indexOf" => Some(new JsNative("indexOf", 1, args =>
      JsNum(s.indexOf(toStr(args.head)).toDouble)))
    case "substring" => Some(new JsNative("substring", -1, args => {
      val a0 = math.max(0, math.min(s.length, toNum(args.headOption.getOrElse(JsNum(0))).toInt))
      val b0 = math.max(0, math.min(s.length, args.lift(1).map(v => toNum(v).toInt).getOrElse(s.length)))
      JsStr(s.substring(math.min(a0, b0), math.max(a0, b0)))
    }))
    case "slice" => Some(new JsNative("slice", -1, args => {
      val n = s.length
      def clamp(d: Double): Int =
        if (d < 0) math.max(0, n + d.toInt) else math.min(n, d.toInt)
      val from = args.headOption.map(v => clamp(toNum(v))).getOrElse(0)
      val until = args.lift(1).map(v => clamp(toNum(v))).getOrElse(n)
      JsStr(if (from < until) s.substring(from, until) else "")
    }))
    case "toLowerCase" => Some(new JsNative("toLowerCase", 0, _ => JsStr(s.toLowerCase)))
    case "toUpperCase" => Some(new JsNative("toUpperCase", 0, _ => JsStr(s.toUpperCase)))
    case "split" => Some(new JsNative("split", 1, args => {
      val out = new JsArr
      val parts = args.headOption match {
        case None | Some(JsUndef) => Array(s)
        case Some(sep) =>
          val ss = toStr(sep)
          if (ss.isEmpty) s.map(_.toString).toArray
          else s.split(java.util.regex.Pattern.quote(ss), -1)
      }
      parts.foreach(p => out.items += JsStr(p))
      out
    }))
    case "trim"     => Some(new JsNative("trim", 0, _ => JsStr(s.trim)))
    case "toString" => Some(new JsNative("toString", 0, _ => JsStr(s)))
    case _ => None
  }

  // ------------------------------------------------------------ operators
  private def binary(op: String, l: JsVal, r: JsVal): JsVal = op match {
    case "+" =>
      (toPrimitive(l), toPrimitive(r)) match {
        case (JsStr(a), b) => JsStr(a + toStr(b))
        case (a, JsStr(b)) => JsStr(toStr(a) + b)
        case (a, b)        => JsNum(toNum(a) + toNum(b))
      }
    case "-" => JsNum(toNum(l) - toNum(r))
    case "*" => JsNum(toNum(l) * toNum(r))
    case "/" => JsNum(toNum(l) / toNum(r))
    case "%" => JsNum(toNum(l) % toNum(r))
    case "==" => JsBool(looseEquals(l, r))
    case "!=" => JsBool(!looseEquals(l, r))
    case "===" => JsBool(strictEquals(l, r))
    case "!==" => JsBool(!strictEquals(l, r))
    case "<" | ">" | "<=" | ">=" =>
      val res = (toPrimitive(l), toPrimitive(r)) match {
        case (JsStr(a), JsStr(b)) =>
          val c = a.compareTo(b)
          op match {
            case "<" => c < 0; case ">" => c > 0
            case "<=" => c <= 0; case _ => c >= 0
          }
        case (a, b) =>
          val (x, y) = (toNum(a), toNum(b))
          if (x.isNaN || y.isNaN) false
          else op match {
            case "<" => x < y; case ">" => x > y
            case "<=" => x <= y; case _ => x >= y
          }
      }
      JsBool(res)
    case "&" => JsNum((toInt32(l) & toInt32(r)).toDouble)
    case "|" => JsNum((toInt32(l) | toInt32(r)).toDouble)
    case "^" => JsNum((toInt32(l) ^ toInt32(r)).toDouble)
    case "<<" => JsNum((toInt32(l) << (toInt32(r) & 31)).toDouble)
    case ">>" => JsNum((toInt32(l) >> (toInt32(r) & 31)).toDouble)
    case ">>>" =>
      JsNum(((toInt32(l).toLong & 0xFFFFFFFFL) >>> (toInt32(r) & 31)).toDouble)
    case other => throw OracleRunError(s"unsupported operator $other")
  }

  private def looseEquals(l: JsVal, r: JsVal): Boolean = (l, r) match {
    case (JsNull, JsUndef) | (JsUndef, JsNull) => true
    case (JsNum(_), JsNum(_)) | (JsStr(_), JsStr(_)) | (JsBool(_), JsBool(_)) =>
      strictEquals(l, r)
    case (JsNull, JsNull) | (JsUndef, JsUndef) => true
    case (JsNum(a), JsStr(_))  => a == toNum(r)
    case (JsStr(_), JsNum(b))  => toNum(l) == b
    case (JsBool(_), _)        => looseEquals(JsNum(toNum(l)), r)
    case (_, JsBool(_))        => looseEquals(l, JsNum(toNum(r)))
    case (o @ (_: JsObj | _: JsArr), p) if !p.isInstanceOf[JsObj] &&
        !p.isInstanceOf[JsArr] && p != JsNull && p != JsUndef =>
      looseEquals(toPrimitive(o), p)
    case (p, o @ (_: JsObj | _: JsArr)) if !p.isInstanceOf[JsObj] &&
        !p.isInstanceOf[JsArr] && p != JsNull && p != JsUndef =>
      looseEquals(p, toPrimitive(o))
    case _ => strictEquals(l, r)
  }

  private def strictEquals(l: JsVal, r: JsVal): Boolean = (l, r) match {
    case (JsNum(a), JsNum(b))   => a == b // NaN != NaN, +0 == -0, like JS
    case (JsStr(a), JsStr(b))   => a == b
    case (JsBool(a), JsBool(b)) => a == b
    case (JsNull, JsNull)       => true
    case (JsUndef, JsUndef)     => true
    case (a: AnyRef, b: AnyRef) => a eq b
  }
}

object JsInterp {

  /** ES5 var scope: one frame per function call, assignment walks the
    * chain and falls through to the GLOBAL frame when unresolved.
    */
  final class Env(val parent: Option[Env]) {
    private val slots = mutable.HashMap.empty[String, JsVal]
    def declare(nm: String, v: JsVal): Unit = slots(nm) = v
    def has(nm: String): Boolean = slots.contains(nm)
    def lookup(nm: String): Option[JsVal] =
      slots.get(nm).orElse(parent.flatMap(_.lookup(nm)))
    def assign(nm: String, v: JsVal): Unit = {
      var e: Env = this
      while (!e.slots.contains(nm) && e.parent.isDefined) e = e.parent.get
      e.slots(nm) = v // unresolved lands in the root (global) frame
    }
  }

  def truthy(v: JsVal): Boolean = v match {
    case JsBool(b) => b
    case JsNum(d)  => d != 0 && !d.isNaN
    case JsStr(s)  => s.nonEmpty
    case JsNull | JsUndef => false
    case _ => true
  }

  def toNum(v: JsVal): Double = v match {
    case JsNum(d)  => d
    case JsBool(b) => if (b) 1 else 0
    case JsNull    => 0
    case JsUndef   => Double.NaN
    case JsStr(s) =>
      val t = s.trim
      if (t.isEmpty) 0
      else try t.toDouble catch { case _: NumberFormatException => Double.NaN }
    case o => toNum(toPrimitive(o))
  }

  def toInt32(v: JsVal): Int = {
    val d = toNum(v)
    if (d.isNaN || d.isInfinite) 0 else d.toLong.toInt
  }

  /** JS number formatting: integral doubles print without a decimal
    * point, everything else uses the shortest round-trip repr.
    */
  def numToStr(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == Double.PositiveInfinity) "Infinity"
    else if (d == Double.NegativeInfinity) "-Infinity"
    else if (d.isWhole && math.abs(d) < 1e21)
      BigDecimal(d).toBigInt.toString
    else d.toString

  def toStr(v: JsVal): String = v match {
    case JsNum(d)  => numToStr(d)
    case JsStr(s)  => s
    case JsBool(b) => b.toString
    case JsNull    => "null"
    case JsUndef   => "undefined"
    case a: JsArr  => a.items.map {
      case JsNull | JsUndef => ""
      case x => toStr(x)
    }.mkString(",")
    case _: JsObj  => "[object Object]"
    case f: JsFunc => s"function ${f.name.getOrElse("")}() { ... }"
    case n: JsNative => s"function ${n.name}() { [native] }"
    case h: JsHost => s"[object ${h.hostName}]"
  }

  private def toPrimitive(v: JsVal): JsVal = v match {
    case _: JsObj | _: JsArr | _: JsFunc | _: JsNative | _: JsHost =>
      JsStr(toStr(v))
    case prim => prim
  }

  def typeOf(v: JsVal): String = v match {
    case _: JsNum  => "number"
    case _: JsStr  => "string"
    case _: JsBool => "boolean"
    case JsUndef   => "undefined"
    case JsNull    => "object"
    case _: JsFunc | _: JsNative => "function"
    case _ => "object"
  }

  // ------------------------------------------------------- JSON bridge
  def fromJson(j: JValue): JsVal = j match {
    case JNull | JNothing => JsNull
    case JInt(i)          => JsNum(i.toDouble)
    case JLong(l)         => JsNum(l.toDouble)
    case JDouble(d)       => JsNum(d)
    case JDecimal(d)      => JsNum(d.toDouble)
    case JString(s)       => JsStr(s)
    case JBool(b)         => JsBool(b)
    case JArray(items) =>
      val a = new JsArr
      items.foreach(it => a.items += fromJson(it))
      a
    case JObject(fields) =>
      val o = new JsObj
      fields.foreach { case (k, v) => o.fields(k) = fromJson(v) }
      o
    case JSet(items) =>
      val a = new JsArr
      items.foreach(it => a.items += fromJson(it))
      a
  }

  /** To JSON with Go's encoding/json conventions (the reference marshals
    * the otto export): object keys sorted, integral doubles as integers.
    * Functions and host objects are unmarshalable, like Go funcs.
    */
  def toJson(v: JsVal): JValue = v match {
    case JsNum(d) =>
      if (d.isWhole && !d.isInfinite && math.abs(d) <= 9.007199254740992e15)
        JInt(BigInt(d.toLong))
      else JDouble(d)
    case JsStr(s)  => JString(s)
    case JsBool(b) => JBool(b)
    case JsNull | JsUndef => JNull
    case a: JsArr => JArray(a.items.map(toJson).toList)
    case o: JsObj =>
      JObject(o.fields.toSeq.sortBy(_._1).map { case (k, x) => k -> toJson(x) }.toList)
    case f: JsFunc =>
      throw OracleRunError(s"json: unsupported type: func ${f.name.getOrElse("")}")
    case _ =>
      throw OracleRunError(s"json: unsupported type: ${typeOf(v)}")
  }
}
