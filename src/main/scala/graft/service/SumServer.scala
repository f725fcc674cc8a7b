package graft.service

import java.io.InputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.SumRecord
import graft.oracle.{Oracle, Payload, SqlOracle}

/** The reference deployment surface: `sumd` serves SumService on a socket
  * (cmd/sumd/main.go:100-121). This binds the same 14 RPC shapes
  * (proto/sum.proto:5-25) over HTTP+JSON on the JDK's built-in server —
  * no new dependencies, one POST route per RPC
  * (`/sum.SumService/<RpcName>`), request/response bodies exactly the
  * proto messages as JSON. Differences from the reference, both
  * deliberate: the transport is HTTP+JSON instead of gRPC+protobuf (the
  * container has no protobuf toolchain, and the shapes — not the framing
  * — are the compatibility surface), and `CreateOracle`'s code field is
  * SQL compiled by [[graft.oracle.SqlOracle]] instead of JavaScript
  * (SURVEY.md §7.4.2), with the same compile-at-create rejection.
  *
  * Reference parity kept on the wire: errors are `{success:false, msg}`
  * responses with the store's exact message strings, `Run` results ride
  * the gzip-over-2KiB envelope as `{compressed, payload(base64)}`
  * (node/service/service.go:106-124), and requests are capped at the
  * reference's 50 MiB message limit (cmd/sumd/main.go:104-108).
  */
final class SumServer(val service: SumService, port: Int = 0) {

  /** grpc.MaxRecvMsgSize in sumd — 50 MiB (cmd/sumd/main.go:104-108). */
  val MaxMessageBytes: Int = 50 * 1024 * 1024

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
  server.createContext("/sum.SumService/", handle _)

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort/sum.SumService"

  // ---- dispatch ----------------------------------------------------------

  private def handle(ex: HttpExchange): Unit = {
    try {
      val rpc = ex.getRequestURI.getPath.stripPrefix("/sum.SumService/")
      if (ex.getRequestMethod != "POST") reply(ex, 405, err("POST required"))
      else readCapped(ex.getRequestBody) match {
        case None => reply(ex, 413,
          err(s"message larger than max ($MaxMessageBytes vs. limit)"))
        case Some(body) =>
          val req = if (body.trim.isEmpty) JObject() else
            try JsonMethods.parse(body)
            catch { case e: Exception =>
              reply(ex, 400, err(s"bad request json: ${e.getMessage}")); return
            }
          reply(ex, 200, dispatch(rpc, req))
      }
    } catch {
      case e: Exception => reply(ex, 500, err(s"internal: ${e.getMessage}"))
    } finally ex.close()
  }

  private def dispatch(rpc: String, req: JValue): JValue = rpc match {
    case "CreateRecord" => recordResponse(service.createRecord(decodeRecord(req)))
    case "UpdateRecord" => recordResponse(service.updateRecord(decodeRecord(req)))
    case "ReadRecord"   => recordResponse(service.readRecord(longField(req, "id")))
    case "DeleteRecord" => recordResponse(service.deleteRecord(longField(req, "id")))
    case "ListRecords" =>
      val p = service.listRecords(longField(req, "page", 1),
        longField(req, "per_page", 10))
      JObject(List("total" -> JInt(p.total), "pages" -> JInt(p.pages),
        "records" -> JArray(p.records.toList.map(encodeRecord))))
    case "FindRecords" =>
      val r = service.findRecords(stringField(req, "meta"), stringField(req, "value"))
      JObject(List("success" -> JBool(r.success), "msg" -> JString(r.msg),
        "records" -> JArray(r.records.toList.map(encodeRecord))))
    case "CreateOracle" =>
      graft.oracle.OracleCompiler.compile(service.spark,
          stringField(req, "name"), stringField(req, "code")) match {
        case Left(msg) => JObject(List("success" -> JBool(false),
          "msg" -> JString(msg), "oracle" -> JNull))
        case Right(o) => oracleResponse(service.createOracle(o))
      }
    case "UpdateOracle" =>
      graft.oracle.OracleCompiler.compile(service.spark,
          stringField(req, "name"), stringField(req, "code")) match {
        case Left(msg) => JObject(List("success" -> JBool(false),
          "msg" -> JString(msg), "oracle" -> JNull))
        case Right(o) =>
          oracleResponse(service.updateOracle(o.copy(id = longField(req, "id"))))
      }
    case "ReadOracle"   => oracleResponse(service.readOracle(longField(req, "id")))
    case "DeleteOracle" => oracleResponse(service.deleteOracle(longField(req, "id")))
    case "FindOracle"   => oracleResponse(service.findOracle(stringField(req, "name")))
    case "ListOracles" =>
      val r = service.listOracles(longField(req, "page", 1),
        longField(req, "per_page", 10))
      JObject(List("total" -> JInt(r.total), "pages" -> JInt(r.pages),
        "oracles" -> JArray(r.oracles.toList.map(encodeOracle))))
    case "Run" =>
      val args = req \ "args" match {
        case JArray(xs) => xs.map {
          case JString(s) => s
          case other => JsonMethods.compact(JsonMethods.render(other))
        }
        case _ => Seq.empty[String]
      }
      val r = service.run(longField(req, "oracle_id"), args)
      JObject(List("success" -> JBool(r.success), "msg" -> JString(r.msg),
        "data" -> r.data.map(encodeEnvelope).getOrElse(JNull)))
    case "Info" =>
      val i = service.info()
      JObject(List("version" -> JString(i.version), "cpus" -> JInt(i.cpus),
        "records" -> JInt(i.records), "oracles" -> JInt(i.oracles),
        "next_record_id" -> JInt(i.nextRecordId),
        "spark_version" -> JString(i.sparkVersion),
        "active_jobs" -> JInt(i.activeJobs), "executors" -> JInt(i.executors)))
    case other => err(s"unknown rpc $other")
  }

  // ---- codecs ------------------------------------------------------------

  private def decodeRecord(j: JValue): SumRecord = {
    val data = j \ "data" match {
      case JArray(xs) => xs.map(jnum).map(_.toFloat).toArray
      case _ => Array.empty[Float]
    }
    val shape = j \ "shape" match {
      case JArray(xs) => xs.map(jnum).map(_.toLong).toArray
      case _ => Array.empty[Long]
    }
    val meta = j \ "meta" match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    SumRecord(longField(j, "id"), data, shape, meta)
  }

  private def jnum(v: JValue): Double = v match {
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDouble(d) => d
    case JDecimal(d) => d.toDouble
    case _ => 0.0
  }

  private def encodeRecord(r: SumRecord): JValue =
    JObject(List(
      "id" -> JInt(r.id),
      "data" -> JArray(r.data.toList.map(f => JDouble(f.toDouble))),
      "shape" -> JArray(r.shape.toList.map(l => JInt(l))),
      "meta" -> JObject(r.meta.toList.map { case (k, v) => k -> JString(v) })))

  private def encodeOracle(o: Oracle): JValue =
    JObject(List("id" -> JInt(o.id), "name" -> JString(o.name),
      "code" -> JString(o.code.getOrElse(""))))

  private def encodeEnvelope(e: Payload.Envelope): JValue =
    JObject(List("compressed" -> JBool(e.compressed),
      "payload" -> JString(java.util.Base64.getEncoder.encodeToString(e.payload))))

  private def recordResponse(r: RecordResponse): JValue =
    JObject(List("success" -> JBool(r.success), "msg" -> JString(r.msg),
      "record" -> r.record.map(encodeRecord).getOrElse(JNull)))

  private def oracleResponse(r: OracleResponse): JValue =
    JObject(List("success" -> JBool(r.success), "msg" -> JString(r.msg),
      "oracle" -> r.oracle.map(encodeOracle).getOrElse(JNull)))

  private def longField(j: JValue, name: String, default: Long = 0L): Long =
    j \ name match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JDouble(d) => d.toLong
      case JString(s) => try s.toLong catch { case _: Exception => default }
      case _ => default
    }

  private def stringField(j: JValue, name: String): String =
    j \ name match {
      case JString(s) => s
      case JNothing | JNull => ""
      case other => JsonMethods.compact(JsonMethods.render(other))
    }

  private def err(msg: String): JValue =
    JObject(List("success" -> JBool(false), "msg" -> JString(msg)))

  /** Body bytes as UTF-8, or None when over the 50 MiB cap. */
  private def readCapped(in: InputStream): Option[String] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size > MaxMessageBytes) return None
      n = in.read(buf)
    }
    Some(new String(out.toByteArray, StandardCharsets.UTF_8))
  }

  private def reply(ex: HttpExchange, status: Int, body: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(body))
      .getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }
}
