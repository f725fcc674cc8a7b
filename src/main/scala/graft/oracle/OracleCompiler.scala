package graft.oracle

import org.apache.spark.sql.SparkSession

/** Language dispatch for stored oracle code — the create-time entry the
  * service surfaces use.
  *
  * The reference stores JavaScript oracles (proto/sum.proto:95-99, otto
  * VM); graft additionally accepts SQL. Code whose first token reads as a
  * JS program (a function declaration — the only form the reference
  * accepts, node/service/compiler.go:19-52 — or a leading comment/var
  * that precedes one) compiles through [[graft.oracle.js.JsOracle]];
  * everything else is SQL ([[SqlOracle]]). Either way broken code
  * rejects AT CREATE with the compile message, per the reference's
  * CreateOracle contract.
  */
object OracleCompiler {

  def compile(spark: SparkSession, name: String,
      code: String): Either[String, Oracle] =
    if (looksLikeJs(code)) graft.oracle.js.JsOracle.compile(name, code)
    else SqlOracle.compile(spark, name, code) match {
      case ok @ Right(_) => ok
      case Left(sqlErr) =>
        // The program parsed as JS but declared no entry function AND is
        // not valid SQL: report the reference compiler's message
        // (node/service/compiler_test.go:15-19) rather than a confusing
        // SQL parse error for what was clearly JS input.
        if (parsesAsJs(code)) Left("expected a function declaration")
        else Left(sqlErr)
    }

  /** JS if the whole text parses under the oracle grammar AND declares a
    * top-level function — the acceptance set of the reference compiler,
    * which takes any otto-legal program containing a function declaration
    * (node/service/compiler.go:19-52) regardless of what statement opens
    * it. SQL text never parses as a JS program with a function decl.
    */
  private[graft] def looksLikeJs(code: String): Boolean =
    try graft.oracle.js.JsLang.parse(code)
      .exists(_.isInstanceOf[graft.oracle.js.JsLang.FuncDecl])
    catch { case graft.oracle.js.JsLang.ParseError(_) => false }

  private def parsesAsJs(code: String): Boolean =
    try { graft.oracle.js.JsLang.parse(code); true }
    catch { case graft.oracle.js.JsLang.ParseError(_) => false }
}
