package graft

import scala.io.Source

import org.apache.spark.sql.SparkSession

import graft.model.SumRecord
import graft.service.SumService

/** Interactive/scripted CLI over [[graft.service.SumService]], mirroring
  * the reference's sumcli verb set (cmd/sumcli/handlers/handlers.go:30-53):
  * info, record CRUD (create/read/update/delete/list/find), oracle
  * read/find/list plus run, help, quit. Node-management verbs are
  * intentionally absent: the reference's node membership maps to Spark's
  * executor lifecycle (SURVEY.md §2.5), not to an API.
  *
  * One command per line, pipe-friendly:
  * {{{
  *   echo "create-record 1,2,3 k=v
  *         run 1 1 0.5" | sbt "runMain graft.Cli"
  * }}}
  * Responses print as single-line JSON (the service's response envelopes).
  */
object Cli {

  private val Help =
    """commands:
      |  info
      |  create-record <f1,f2,...> [k=v ...]     sequential id assigned
      |  read-record <id>
      |  update-record <id> <f1,f2,...> [k=v ...]
      |  delete-record <id>
      |  list-records <page> <per_page>
      |  find-records <meta_key> <value>
      |  read-oracle <id>
      |  find-oracle <name>
      |  list-oracles <page> <per_page>
      |  run <oracle_id> [json_arg ...]
      |  help
      |  quit""".stripMargin

  private def parseRecord(dataArg: String, metaArgs: Seq[String], id: Long = 0L): SumRecord = {
    val data = dataArg.split(",").filter(_.nonEmpty).map(_.toFloat)
    val meta = metaArgs.map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"metadata must be k=v, got: $kv")
      kv.take(i) -> kv.drop(i + 1)
    }.toMap
    SumRecord(id, data, Array(data.length.toLong), meta)
  }

  /** JSON string-literal escape for interpolated service text. */
  private def esc(s: String): String = String.valueOf(s).flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def json(r: Any): String = r match {
    case rr: graft.service.RecordResponse =>
      val rec = rr.record.map(x =>
        s""","record":{"id":${x.id},"size":${x.size}}""").getOrElse("")
      s"""{"success":${rr.success},"msg":"${esc(rr.msg)}"$rec}"""
    case lr: graft.service.RecordListResponse =>
      s"""{"total":${lr.total},"pages":${lr.pages},"records":[${
        lr.records.map(_.id).mkString(",")}]}"""
    case fr: graft.service.FindResponse =>
      s"""{"success":${fr.success},"msg":"${esc(fr.msg)}","ids":[${
        fr.records.map(_.id).mkString(",")}]}"""
    case or: graft.service.OracleResponse =>
      val o = or.oracle.map(x =>
        s""","oracle":{"id":${x.id},"name":"${esc(x.name)}"}""").getOrElse("")
      s"""{"success":${or.success},"msg":"${esc(or.msg)}"$o}"""
    case ol: graft.service.OracleListResponse =>
      s"""{"total":${ol.total},"pages":${ol.pages},"oracles":[${
        ol.oracles.map(o => s""""${esc(o.name)}"""").mkString(",")}]}"""
    case cr: graft.service.CallResponse =>
      val body = cr.data.map { env =>
        val s = new String(graft.oracle.Payload.open(env),
          java.nio.charset.StandardCharsets.UTF_8)
        s  // oracle results are already JSON
      }.getOrElse("null")
      s"""{"success":${cr.success},"msg":"${esc(cr.msg)}","data":$body}"""
    case other => other.toString
  }

  def dispatch(svc: SumService, line: String): Option[String] = {
    val parts = line.trim.split("\\s+").toSeq
    if (parts.isEmpty || parts.head.isEmpty) return Some("")
    try dispatchParsed(svc, parts)
    catch {
      case e: Exception =>
        Some(s"""{"success":false,"msg":"bad arguments for ${parts.head}: ${
          esc(String.valueOf(e.getMessage))} (try help)"}""")
    }
  }

  private def dispatchParsed(svc: SumService, parts: Seq[String]): Option[String] = {
    parts.head match {
      case "quit" | "exit" => None
      case "help" => Some(Help)
      case "info" =>
        val i = svc.info()
        Some(s"""{"version":"${i.version}","cpus":${i.cpus},"records":${
          i.records},"oracles":${i.oracles},"next_record_id":${i.nextRecordId}}""")
      case "create-record" =>
        Some(json(svc.createRecord(parseRecord(parts(1), parts.drop(2)))))
      case "read-record" => Some(json(svc.readRecord(parts(1).toLong)))
      case "update-record" =>
        Some(json(svc.updateRecord(
          parseRecord(parts(2), parts.drop(3), parts(1).toLong))))
      case "delete-record" => Some(json(svc.deleteRecord(parts(1).toLong)))
      case "list-records" =>
        Some(json(svc.listRecords(parts(1).toLong, parts(2).toLong)))
      case "find-records" => Some(json(svc.findRecords(parts(1), parts(2))))
      case "read-oracle" => Some(json(svc.readOracle(parts(1).toLong)))
      case "find-oracle" => Some(json(svc.findOracle(parts(1))))
      case "list-oracles" =>
        Some(json(svc.listOracles(parts(1).toLong, parts(2).toLong)))
      case "run" => Some(json(svc.run(parts(1).toLong, parts.drop(2))))
      case other => Some(s"""{"success":false,"msg":"unknown command: $other (try help)"}""")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val svc = SumService(spark)
    println("graft cli — canonical oracles registered; `help` for verbs")
    val lines =
      if (args.nonEmpty) Source.fromFile(args(0)).getLines()
      else Source.stdin.getLines()
    var running = true
    while (running && lines.hasNext) {
      dispatch(svc, lines.next()) match {
        case Some(out) => if (out.nonEmpty) println(out)
        case None => running = false
      }
    }
    spark.stop()
  }
}
