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
    else SqlOracle.compile(spark, name, code)

  /** JS if the first non-comment token is `function` or `var` — the
    * shapes the reference's own compiler tests feed it
    * (node/service/compiler_test.go:15-19). SQL text can never start
    * with either keyword.
    */
  private[graft] def looksLikeJs(code: String): Boolean = {
    var s = code
    var stripped = true
    while (stripped) {
      s = s.stripLeading()
      stripped = false
      if (s.startsWith("//")) {
        val nl = s.indexOf('\n')
        s = if (nl < 0) "" else s.substring(nl + 1)
        stripped = true
      } else if (s.startsWith("/*")) {
        val end = s.indexOf("*/")
        s = if (end < 0) "" else s.substring(end + 2)
        stripped = true
      }
    }
    s.startsWith("function") || s.startsWith("var ")
  }
}
