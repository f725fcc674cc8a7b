package graft.service

import java.net.InetSocketAddress

import scala.jdk.CollectionConverters._

import org.sparkproject.connect.grpc.{CallOptions, MethodDescriptor, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.netty.{GrpcSslContexts, NettyChannelBuilder, NettyServerBuilder}
import org.sparkproject.connect.grpc.stub.{ClientCalls, ServerCalls, StreamObserver}
import org.sparkproject.connect.protobuf.{ByteString, DescriptorProtos, Descriptors, DynamicMessage}

import graft.model.SumRecord
import graft.oracle.{Oracle, Payload, SqlOracle}

/** The reference's ACTUAL wire protocol: `sum.SumService` over gRPC +
  * protobuf (proto/sum.proto:5-25; served by sumd, cmd/sumd/main.go:
  * 100-121) — so a stock protobuf client speaking sum.proto connects to
  * this engine directly, closing the one surface gap the HTTP+JSON binding
  * ([[SumServer]]) left open.
  *
  * No protobuf toolchain ships in this container, so nothing is generated:
  * the message types are DECLARED at runtime (a `FileDescriptorProto`
  * mirroring sum.proto field-for-field, built with the protobuf runtime's
  * public descriptor API) and served as `DynamicMessage`s through manual
  * `MethodDescriptor`s — the same layering generated stubs compile down
  * to. Runtime and transport are the gRPC/Netty/protobuf bundle the Spark
  * distribution itself ships (shaded `org.sparkproject.connect.*` in
  * spark-connect) — public Spark, no new dependencies.
  *
  * Reference parity on the wire: proto3 field numbers/types match
  * sum.proto exactly (uint64 ids, packed floats, string maps), requests
  * are capped at sumd's 50 MiB (cmd/sumd/main.go:104-108), `Run` results
  * ride the gzip-over-2KiB `Data` envelope (node/service/service.go:
  * 106-124), and errors are `{success:false, msg}` RESPONSES with the
  * store's exact strings, never gRPC status errors — matching the
  * reference's error-as-response contract. `CreateOracle` code is SQL
  * (compile-at-create, [[SqlOracle]]) instead of JavaScript — the same
  * deliberate surface change as the HTTP binding (SURVEY.md §7.4.2).
  */
object SumProto {

  import DescriptorProtos.FieldDescriptorProto.{Label, Type}

  private def field(name: String, number: Int, t: Type,
      repeated: Boolean = false, typeName: String = null)
      : DescriptorProtos.FieldDescriptorProto = {
    val b = DescriptorProtos.FieldDescriptorProto.newBuilder()
      .setName(name).setNumber(number).setType(t)
      .setLabel(if (repeated) Label.LABEL_REPEATED else Label.LABEL_OPTIONAL)
    if (typeName != null) b.setTypeName(typeName)
    b.build()
  }

  private def message(name: String,
      fields: DescriptorProtos.FieldDescriptorProto*)
      : DescriptorProtos.DescriptorProto =
    DescriptorProtos.DescriptorProto.newBuilder()
      .setName(name).addAllField(fields.asJava).build()

  /** sum.proto's message set (proto/sum.proto:41-153), declared
    * field-for-field. The map<string,string> meta field is what proto3
    * map syntax compiles to: a repeated nested MetaEntry with the
    * map_entry option.
    */
  private val fileDescriptor: Descriptors.FileDescriptor = {
    val metaEntry = DescriptorProtos.DescriptorProto.newBuilder()
      .setName("MetaEntry")
      .setOptions(DescriptorProtos.MessageOptions.newBuilder().setMapEntry(true))
      .addField(field("key", 1, Type.TYPE_STRING))
      .addField(field("value", 2, Type.TYPE_STRING))
      .build()
    val record = DescriptorProtos.DescriptorProto.newBuilder()
      .setName("Record")
      .addField(field("id", 1, Type.TYPE_UINT64))
      .addField(field("data", 2, Type.TYPE_FLOAT, repeated = true))
      .addField(field("shape", 3, Type.TYPE_UINT64, repeated = true))
      .addField(field("meta", 4, Type.TYPE_MESSAGE, repeated = true,
        typeName = ".sum.Record.MetaEntry"))
      .addNestedType(metaEntry)
      .build()
    val fdp = DescriptorProtos.FileDescriptorProto.newBuilder()
      .setName("sum.proto").setPackage("sum").setSyntax("proto3")
      .addMessageType(record)
      .addMessageType(message("RecordResponse",
        field("success", 1, Type.TYPE_BOOL),
        field("msg", 2, Type.TYPE_STRING),
        field("record", 3, Type.TYPE_MESSAGE, typeName = ".sum.Record")))
      .addMessageType(message("ListRequest",
        field("page", 1, Type.TYPE_UINT64),
        field("per_page", 2, Type.TYPE_UINT64)))
      .addMessageType(message("RecordListResponse",
        field("total", 1, Type.TYPE_UINT64),
        field("pages", 2, Type.TYPE_UINT64),
        field("records", 3, Type.TYPE_MESSAGE, repeated = true,
          typeName = ".sum.Record")))
      .addMessageType(message("FindResponse",
        field("success", 1, Type.TYPE_BOOL),
        field("msg", 2, Type.TYPE_STRING),
        field("records", 3, Type.TYPE_MESSAGE, repeated = true,
          typeName = ".sum.Record")))
      .addMessageType(message("Oracle",
        field("id", 1, Type.TYPE_UINT64),
        field("name", 2, Type.TYPE_STRING),
        field("code", 3, Type.TYPE_STRING)))
      .addMessageType(message("OracleResponse",
        field("success", 1, Type.TYPE_BOOL),
        field("msg", 2, Type.TYPE_STRING),
        field("oracle", 3, Type.TYPE_MESSAGE, typeName = ".sum.Oracle")))
      .addMessageType(message("OracleListResponse",
        field("total", 1, Type.TYPE_UINT64),
        field("pages", 2, Type.TYPE_UINT64),
        field("oracles", 3, Type.TYPE_MESSAGE, repeated = true,
          typeName = ".sum.Oracle")))
      .addMessageType(message("Call",
        field("oracle_id", 1, Type.TYPE_UINT64),
        field("args", 2, Type.TYPE_STRING, repeated = true)))
      .addMessageType(message("Data",
        field("compressed", 1, Type.TYPE_BOOL),
        field("payload", 2, Type.TYPE_BYTES)))
      .addMessageType(message("CallResponse",
        field("success", 1, Type.TYPE_BOOL),
        field("msg", 2, Type.TYPE_STRING),
        field("data", 3, Type.TYPE_MESSAGE, typeName = ".sum.Data")))
      .addMessageType(message("ById", field("id", 1, Type.TYPE_UINT64)))
      .addMessageType(message("ByName", field("name", 1, Type.TYPE_STRING)))
      .addMessageType(message("ByMeta",
        field("meta", 1, Type.TYPE_STRING),
        field("value", 2, Type.TYPE_STRING)))
      .addMessageType(message("ServerInfo",
        field("version", 1, Type.TYPE_STRING),
        field("os", 2, Type.TYPE_STRING),
        field("arch", 3, Type.TYPE_STRING),
        field("go_version", 4, Type.TYPE_STRING),
        field("cpus", 5, Type.TYPE_UINT64),
        field("max_cpus", 6, Type.TYPE_UINT64),
        field("goroutines", 7, Type.TYPE_UINT64),
        field("alloc", 8, Type.TYPE_UINT64),
        field("sys", 9, Type.TYPE_UINT64),
        field("num_gc", 10, Type.TYPE_UINT64),
        field("datapath", 11, Type.TYPE_STRING),
        field("credspath", 12, Type.TYPE_STRING),
        field("address", 13, Type.TYPE_STRING),
        field("uptime", 14, Type.TYPE_UINT64),
        field("pid", 15, Type.TYPE_UINT64),
        field("uid", 16, Type.TYPE_UINT64),
        field("argv", 17, Type.TYPE_STRING, repeated = true),
        field("records", 18, Type.TYPE_UINT64),
        field("oracles", 19, Type.TYPE_UINT64),
        field("backend", 20, Type.TYPE_STRING),
        field("backend_space", 21, Type.TYPE_UINT64),
        field("backend_used", 22, Type.TYPE_UINT64),
        field("next_record_id", 23, Type.TYPE_UINT64)))
      .addMessageType(message("Empty"))
      .addMessageType(message("Records",
        field("records", 1, Type.TYPE_MESSAGE, repeated = true,
          typeName = ".sum.Record")))
      .addMessageType(message("RecordIds",
        field("ids", 1, Type.TYPE_UINT64, repeated = true)))
      .addMessageType(message("ByAddr",
        field("address", 1, Type.TYPE_STRING),
        field("cert_file", 2, Type.TYPE_STRING)))
      .addMessageType(message("Node",
        field("id", 1, Type.TYPE_UINT64),
        field("name", 2, Type.TYPE_STRING),
        field("info", 3, Type.TYPE_MESSAGE, typeName = ".sum.ServerInfo")))
      .addMessageType(message("NodeResponse",
        field("success", 1, Type.TYPE_BOOL),
        field("msg", 2, Type.TYPE_STRING),
        field("nodes", 3, Type.TYPE_MESSAGE, repeated = true,
          typeName = ".sum.Node")))
      .build()
    Descriptors.FileDescriptor.buildFrom(fdp,
      Array.empty[Descriptors.FileDescriptor])
  }

  def descriptor(name: String): Descriptors.Descriptor = {
    val d = fileDescriptor.findMessageTypeByName(name)
    require(d != null, s"unknown sum.proto message $name")
    d
  }

  /** RPC name -> (request message, response message), the 14 methods of
    * sum.SumService (proto/sum.proto:5-25).
    */
  val rpcShapes: Seq[(String, (String, String))] = Seq(
    "CreateRecord" -> ("Record", "RecordResponse"),
    "UpdateRecord" -> ("Record", "RecordResponse"),
    "ReadRecord" -> ("ById", "RecordResponse"),
    "ListRecords" -> ("ListRequest", "RecordListResponse"),
    "DeleteRecord" -> ("ById", "RecordResponse"),
    "FindRecords" -> ("ByMeta", "FindResponse"),
    "CreateOracle" -> ("Oracle", "OracleResponse"),
    "UpdateOracle" -> ("Oracle", "OracleResponse"),
    "ReadOracle" -> ("ById", "OracleResponse"),
    "ListOracles" -> ("ListRequest", "OracleListResponse"),
    "FindOracle" -> ("ByName", "OracleResponse"),
    "DeleteOracle" -> ("ById", "OracleResponse"),
    "Run" -> ("Call", "CallResponse"),
    "Info" -> ("Empty", "ServerInfo"))

  /** sum.SumInternalService (proto/sum.proto:27-31) — the node-to-node
    * surface the master uses for sharded placement.
    */
  val internalRpcShapes: Seq[(String, (String, String))] = Seq(
    "CreateRecordWithId" -> ("Record", "RecordResponse"),
    "CreateRecordsWithId" -> ("Records", "RecordResponse"),
    "DeleteRecords" -> ("RecordIds", "RecordResponse"))

  /** sum.SumMasterService (proto/sum.proto:33-37) — cluster membership. */
  val masterRpcShapes: Seq[(String, (String, String))] = Seq(
    "AddNode" -> ("ByAddr", "NodeResponse"),
    "ListNodes" -> ("Empty", "NodeResponse"),
    "DeleteNode" -> ("ById", "NodeResponse"))

  private val allShapes: Map[String, (String, (String, String))] =
    (rpcShapes.map { case (rpc, s) => rpc -> ("sum.SumService", s) } ++
      internalRpcShapes.map { case (rpc, s) =>
        rpc -> ("sum.SumInternalService", s) } ++
      masterRpcShapes.map { case (rpc, s) =>
        rpc -> ("sum.SumMasterService", s) }).toMap

  def methodDescriptor(rpc: String)
      : MethodDescriptor[DynamicMessage, DynamicMessage] = {
    val (svc, (in, out)) = allShapes(rpc)
    MethodDescriptor.newBuilder(marshaller(descriptor(in)), marshaller(descriptor(out)))
      .setType(MethodDescriptor.MethodType.UNARY)
      .setFullMethodName(MethodDescriptor.generateFullMethodName(svc, rpc))
      .build()
  }

  private def marshaller(d: Descriptors.Descriptor)
      : MethodDescriptor.Marshaller[DynamicMessage] =
    new MethodDescriptor.Marshaller[DynamicMessage] {
      override def stream(value: DynamicMessage): java.io.InputStream =
        value.toByteString.newInput()
      override def parse(stream: java.io.InputStream): DynamicMessage =
        try DynamicMessage.parseFrom(d, stream)
        catch {
          case e: java.io.IOException => throw Status.INTERNAL
            .withDescription(s"malformed ${d.getName}: ${e.getMessage}")
            .withCause(e).asRuntimeException()
        }
    }

  // ---- field access helpers ------------------------------------------------

  def getLong(m: DynamicMessage, name: String): Long =
    m.getField(m.getDescriptorForType.findFieldByName(name)).asInstanceOf[Long]

  def getString(m: DynamicMessage, name: String): String =
    m.getField(m.getDescriptorForType.findFieldByName(name)).asInstanceOf[String]

  def getStrings(m: DynamicMessage, name: String): Seq[String] =
    m.getField(m.getDescriptorForType.findFieldByName(name))
      .asInstanceOf[java.util.List[_]].asScala.toSeq.map(_.asInstanceOf[String])

  // ---- model <-> proto -----------------------------------------------------

  def recordToProto(r: SumRecord): DynamicMessage = {
    val d = descriptor("Record")
    val b = DynamicMessage.newBuilder(d)
      .setField(d.findFieldByName("id"), java.lang.Long.valueOf(r.id))
    val dataF = d.findFieldByName("data")
    r.data.foreach(f => b.addRepeatedField(dataF, java.lang.Float.valueOf(f)))
    val shapeF = d.findFieldByName("shape")
    r.shape.foreach(s => b.addRepeatedField(shapeF, java.lang.Long.valueOf(s)))
    val metaF = d.findFieldByName("meta")
    val entryD = d.findNestedTypeByName("MetaEntry")
    r.meta.toSeq.sortBy(_._1).foreach { case (k, v) =>
      b.addRepeatedField(metaF, DynamicMessage.newBuilder(entryD)
        .setField(entryD.findFieldByName("key"), k)
        .setField(entryD.findFieldByName("value"), v)
        .build())
    }
    b.build()
  }

  def protoToRecord(m: DynamicMessage): SumRecord = {
    val d = m.getDescriptorForType
    val data = m.getField(d.findFieldByName("data"))
      .asInstanceOf[java.util.List[_]].asScala
      .map(_.asInstanceOf[java.lang.Float].floatValue()).toArray
    val shape = m.getField(d.findFieldByName("shape"))
      .asInstanceOf[java.util.List[_]].asScala
      .map(_.asInstanceOf[java.lang.Long].longValue()).toArray
    val meta = m.getField(d.findFieldByName("meta"))
      .asInstanceOf[java.util.List[_]].asScala.map { e =>
        val em = e.asInstanceOf[DynamicMessage]
        getString(em, "key") -> getString(em, "value")
      }.toMap
    SumRecord(getLong(m, "id"), data, shape, meta)
  }

  def oracleToProto(o: Oracle): DynamicMessage = {
    val d = descriptor("Oracle")
    DynamicMessage.newBuilder(d)
      .setField(d.findFieldByName("id"), java.lang.Long.valueOf(o.id))
      .setField(d.findFieldByName("name"), o.name)
      .setField(d.findFieldByName("code"), o.code.getOrElse(""))
      .build()
  }
}

/** gRPC binding of [[SumService]] on a loopback Netty socket — see
  * [[SumProto]] for the wire contract. Port 0 binds an ephemeral port
  * (read it back from [[boundPort]]), matching [[SumServer]]'s lifecycle
  * API so the daemon can serve both transports side by side.
  *
  * `credsPath` mirrors sumd's `-creds` flag (cmd/sumd/main.go:32,217-219):
  * a directory holding `cert.pem` + `key.pem`; when set, the socket serves
  * TLS (credentials.NewServerTLSFromFile's exact file layout), otherwise
  * plaintext. Clients connect with [[SumGrpcClient]] passing the cert file
  * to trust — the master/node.go:64 NewClientTLSFromFile shape.
  */
final class SumGrpcServer(val service: SumService, port: Int = 0,
    credsPath: Option[String] = None,
    /** When set, this server is a MASTER (reference cmd/sumd in master
      * mode): node-membership RPCs attach/detach real engines through
      * the federation, record CRUD routes to nodes, the oracle surface
      * is the federation cage, and Run is the distributed scatter-merge.
      * Absent (the default), the server is a single engine and behaves
      * exactly as before.
      */
    federation: Option[SumFederation] = None) {

  import SumProto._

  /** grpc.MaxRecvMsgSize in sumd — 50 MiB (cmd/sumd/main.go:104-108). */
  val MaxMessageBytes: Int = 50 * 1024 * 1024

  private def b(v: Boolean): java.lang.Boolean = java.lang.Boolean.valueOf(v)
  private def l(v: Long): java.lang.Long = java.lang.Long.valueOf(v)

  private def recordResponse(r: RecordResponse): DynamicMessage = {
    val d = descriptor("RecordResponse")
    val mb = DynamicMessage.newBuilder(d)
      .setField(d.findFieldByName("success"), b(r.success))
      .setField(d.findFieldByName("msg"), r.msg)
    r.record.foreach(rec =>
      mb.setField(d.findFieldByName("record"), recordToProto(rec)))
    mb.build()
  }

  private def oracleResponse(r: OracleResponse): DynamicMessage = {
    val d = descriptor("OracleResponse")
    val mb = DynamicMessage.newBuilder(d)
      .setField(d.findFieldByName("success"), b(r.success))
      .setField(d.findFieldByName("msg"), r.msg)
    r.oracle.foreach(o => mb.setField(d.findFieldByName("oracle"), oracleToProto(o)))
    mb.build()
  }

  private def compileOracle(m: DynamicMessage): Either[DynamicMessage, Oracle] =
    graft.oracle.OracleCompiler.compile(
      service.spark, getString(m, "name"), getString(m, "code"))
      .left.map(msg => oracleResponse(OracleResponse(success = false, msg)))

  /** RPC name -> handler. Same dispatch semantics as the HTTP binding —
    * notably errors stay error RESPONSES ({success:false, msg}), and
    * oracle code compiles at create.
    */
  private val handlers: Map[String, DynamicMessage => DynamicMessage] = Map(
    "CreateRecord" -> (m => recordResponse(service.createRecord(protoToRecord(m)))),
    "UpdateRecord" -> (m => recordResponse(service.updateRecord(protoToRecord(m)))),
    "ReadRecord" -> (m => recordResponse(service.readRecord(getLong(m, "id")))),
    "DeleteRecord" -> (m => recordResponse(service.deleteRecord(getLong(m, "id")))),
    "ListRecords" -> { m =>
      val page = getLong(m, "page"); val perPage = getLong(m, "per_page")
      val p = service.listRecords(if (page == 0) 1 else page,
        if (perPage == 0) 10 else perPage)
      val d = descriptor("RecordListResponse")
      val mb = DynamicMessage.newBuilder(d)
        .setField(d.findFieldByName("total"), l(p.total))
        .setField(d.findFieldByName("pages"), l(p.pages))
      val f = d.findFieldByName("records")
      p.records.foreach(r => mb.addRepeatedField(f, recordToProto(r)))
      mb.build()
    },
    "FindRecords" -> { m =>
      val r = service.findRecords(getString(m, "meta"), getString(m, "value"))
      val d = descriptor("FindResponse")
      val mb = DynamicMessage.newBuilder(d)
        .setField(d.findFieldByName("success"), b(r.success))
        .setField(d.findFieldByName("msg"), r.msg)
      val f = d.findFieldByName("records")
      r.records.foreach(rec => mb.addRepeatedField(f, recordToProto(rec)))
      mb.build()
    },
    "CreateOracle" -> (m => compileOracle(m).fold(identity,
      o => oracleResponse(service.createOracle(o)))),
    "UpdateOracle" -> (m => compileOracle(m).fold(identity,
      o => oracleResponse(service.updateOracle(o.copy(id = getLong(m, "id")))))),
    "ReadOracle" -> (m => oracleResponse(service.readOracle(getLong(m, "id")))),
    "DeleteOracle" -> (m => oracleResponse(service.deleteOracle(getLong(m, "id")))),
    "FindOracle" -> (m => oracleResponse(service.findOracle(getString(m, "name")))),
    "ListOracles" -> { m =>
      val page = getLong(m, "page"); val perPage = getLong(m, "per_page")
      val r = service.listOracles(if (page == 0) 1 else page,
        if (perPage == 0) 10 else perPage)
      val d = descriptor("OracleListResponse")
      val mb = DynamicMessage.newBuilder(d)
        .setField(d.findFieldByName("total"), l(r.total))
        .setField(d.findFieldByName("pages"), l(r.pages))
      val f = d.findFieldByName("oracles")
      r.oracles.foreach(o => mb.addRepeatedField(f, SumProto.oracleToProto(o)))
      mb.build()
    },
    "Run" -> { m =>
      val r = service.run(getLong(m, "oracle_id"), getStrings(m, "args"))
      val d = descriptor("CallResponse")
      val mb = DynamicMessage.newBuilder(d)
        .setField(d.findFieldByName("success"), b(r.success))
        .setField(d.findFieldByName("msg"), r.msg)
      r.data.foreach { env =>
        val dd = descriptor("Data")
        mb.setField(d.findFieldByName("data"), DynamicMessage.newBuilder(dd)
          .setField(dd.findFieldByName("compressed"), b(env.compressed))
          .setField(dd.findFieldByName("payload"), ByteString.copyFrom(env.payload))
          .build())
      }
      mb.build()
    },
    "Info" -> { _ =>
      val i = service.info()
      val d = descriptor("ServerInfo")
      DynamicMessage.newBuilder(d)
        .setField(d.findFieldByName("version"), i.version)
        .setField(d.findFieldByName("os"), sys.props.getOrElse("os.name", ""))
        .setField(d.findFieldByName("arch"), sys.props.getOrElse("os.arch", ""))
        .setField(d.findFieldByName("cpus"), l(i.cpus.toLong))
        .setField(d.findFieldByName("max_cpus"), l(i.cpus.toLong))
        .setField(d.findFieldByName("pid"), l(ProcessHandle.current().pid()))
        .setField(d.findFieldByName("records"), l(i.records))
        .setField(d.findFieldByName("oracles"), l(i.oracles))
        .setField(d.findFieldByName("backend"), s"spark-${i.sparkVersion}")
        .setField(d.findFieldByName("next_record_id"), l(i.nextRecordId))
        .build()
    })

  /** sum.SumInternalService handlers (proto/sum.proto:27-31): real ops —
    * the store implements the reference's with-id/batch-rollback/bulk
    * semantics directly.
    */
  private val internalHandlers: Map[String, DynamicMessage => DynamicMessage] =
    Map(
      "CreateRecordWithId" ->
        (m => recordResponse(service.createRecordWithId(protoToRecord(m)))),
      "CreateRecordsWithId" -> { m =>
        val d = m.getDescriptorForType
        val recs = m.getField(d.findFieldByName("records"))
          .asInstanceOf[java.util.List[_]].asScala.toSeq
          .map(r => protoToRecord(r.asInstanceOf[DynamicMessage]))
        recordResponse(service.createRecordsWithId(recs))
      },
      "DeleteRecords" -> { m =>
        val d = m.getDescriptorForType
        val ids = m.getField(d.findFieldByName("ids"))
          .asInstanceOf[java.util.List[_]].asScala.toSeq
          .map(_.asInstanceOf[java.lang.Long].longValue())
        recordResponse(service.deleteRecords(ids))
      })

  private def nodeResponse(r: NodeResponse): DynamicMessage = {
    val d = descriptor("NodeResponse")
    val nd = descriptor("Node")
    val mb = DynamicMessage.newBuilder(d)
      .setField(d.findFieldByName("success"), b(r.success))
      .setField(d.findFieldByName("msg"), r.msg)
    val f = d.findFieldByName("nodes")
    r.nodes.foreach(n => mb.addRepeatedField(f, DynamicMessage.newBuilder(nd)
      .setField(nd.findFieldByName("id"), l(n.id))
      .setField(nd.findFieldByName("name"), n.name)
      .build()))
    mb.build()
  }

  /** sum.SumMasterService handlers (proto/sum.proto:33-37): with a
    * federation these are REAL — AddNode dials the address and attaches
    * the engine (rebalance + oracle absorption included); without one,
    * the single-engine truth — this engine is the one permanent node.
    */
  private val masterHandlers: Map[String, DynamicMessage => DynamicMessage] =
    federation match {
      case Some(fed) => Map(
        "AddNode" -> (m => nodeResponse(fed.addNode(getString(m, "address")))),
        "ListNodes" -> (_ => nodeResponse(NodeResponse(success = true, "",
          fed.listNodes().map(n => NodeEntry(n.id, n.name))))),
        "DeleteNode" ->
          (m => nodeResponse(fed.deleteNode(getLong(m, "id")))))
      case None => Map(
        "AddNode" ->
          (m => nodeResponse(service.addNode(getString(m, "address")))),
        "ListNodes" -> (_ => nodeResponse(service.listNodes())),
        "DeleteNode" ->
          (m => nodeResponse(service.deleteNode(getLong(m, "id")))))
    }

  /** Master-mode overrides of the public-service handlers: record CRUD
    * routes to the federated nodes (mux_records.go), the oracle surface
    * is the master cage, Run is the distributed pipeline. Everything not
    * overridden (FindOracle etc. work on the cage the same way) is built
    * against the cage registry below.
    */
  private def masterOverrides(fed: SumFederation)
      : Map[String, DynamicMessage => DynamicMessage] = {
    val cage = fed.oracles
    Map(
      "CreateRecord" ->
        (m => recordResponse(fed.createRecord(protoToRecord(m)))),
      "UpdateRecord" ->
        (m => recordResponse(fed.updateRecord(protoToRecord(m)))),
      "ReadRecord" -> (m => recordResponse(fed.readRecord(getLong(m, "id")))),
      "DeleteRecord" ->
        (m => recordResponse(fed.deleteRecord(getLong(m, "id")))),
      "ListRecords" -> { m =>
        val page = getLong(m, "page"); val perPage = getLong(m, "per_page")
        val p = fed.listRecords(if (page == 0) 1 else page,
          if (perPage == 0) 10 else perPage)
        val d = descriptor("RecordListResponse")
        val mb = DynamicMessage.newBuilder(d)
          .setField(d.findFieldByName("total"), l(p.total))
          .setField(d.findFieldByName("pages"), l(p.pages))
        val f = d.findFieldByName("records")
        p.records.foreach(r => mb.addRepeatedField(f, recordToProto(r)))
        mb.build()
      },
      "FindRecords" -> { m =>
        val r = fed.findRecords(getString(m, "meta"), getString(m, "value"))
        val d = descriptor("FindResponse")
        val mb = DynamicMessage.newBuilder(d)
          .setField(d.findFieldByName("success"), b(r.success))
          .setField(d.findFieldByName("msg"), r.msg)
        val f = d.findFieldByName("records")
        r.records.foreach(rec => mb.addRepeatedField(f, recordToProto(rec)))
        mb.build()
      },
      "CreateOracle" -> (m => compileOracle(m).fold(identity, o =>
        oracleResponse(cage.create(o) match {
          case Left(err) => OracleResponse(success = false, err)
          case Right(oc) => OracleResponse(success = true, oc.id.toString, Some(oc))
        }))),
      // master UpdateOracle targets the CAGE (master/mux_oracles.go:43-62),
      // not the single-engine registry — the cage is what ReadOracle/Run
      // serve in master mode
      "UpdateOracle" -> (m => compileOracle(m).fold(identity, o =>
        oracleResponse(cage.update(o.copy(id = getLong(m, "id"))) match {
          case Left(err) => OracleResponse(success = false, err)
          case Right(oc) => OracleResponse(success = true, oc.id.toString, Some(oc))
        }))),
      "ReadOracle" -> (m => oracleResponse(cage.read(getLong(m, "id")) match {
        case Left(err) => OracleResponse(success = false, err)
        case Right(oc) => OracleResponse(success = true, "", Some(oc))
      })),
      "FindOracle" -> (m => oracleResponse(
        cage.findByName(getString(m, "name")) match {
          case Left(err) => OracleResponse(success = false, err)
          case Right(oc) => OracleResponse(success = true, "", Some(oc))
        })),
      "DeleteOracle" -> (m => oracleResponse(cage.delete(getLong(m, "id")) match {
        case Left(err) => OracleResponse(success = false, err)
        case Right(oc) => OracleResponse(success = true, "", Some(oc))
      })),
      "ListOracles" -> { m =>
        val page = getLong(m, "page"); val perPage = getLong(m, "per_page")
        val (total, pages, items) = cage.list(if (page == 0) 1 else page,
          if (perPage == 0) 10 else perPage)
        val d = descriptor("OracleListResponse")
        val mb = DynamicMessage.newBuilder(d)
          .setField(d.findFieldByName("total"), l(total))
          .setField(d.findFieldByName("pages"), l(pages))
        val f = d.findFieldByName("oracles")
        items.foreach(o => mb.addRepeatedField(f, SumProto.oracleToProto(o)))
        mb.build()
      },
      "Run" -> { m =>
        val r = fed.run(getLong(m, "oracle_id"), getStrings(m, "args"))
        val d = descriptor("CallResponse")
        val mb = DynamicMessage.newBuilder(d)
          .setField(d.findFieldByName("success"), b(r.success))
          .setField(d.findFieldByName("msg"), r.msg)
        r.data.foreach { env =>
          val dd = descriptor("Data")
          mb.setField(d.findFieldByName("data"), DynamicMessage.newBuilder(dd)
            .setField(dd.findFieldByName("compressed"), b(env.compressed))
            .setField(dd.findFieldByName("payload"),
              ByteString.copyFrom(env.payload))
            .build())
        }
        mb.build()
      },
      "Info" -> { _ =>
        val d = descriptor("ServerInfo")
        DynamicMessage.newBuilder(d)
          .setField(d.findFieldByName("version"), service.info().version)
          .setField(d.findFieldByName("records"), l(fed.totalRecords))
          .setField(d.findFieldByName("oracles"), l(cage.size.toLong))
          .setField(d.findFieldByName("next_record_id"), l(fed.nextRecordId))
          .build()
      })
  }

  private def buildService(name: String, shapes: Seq[(String, (String, String))],
      fns: Map[String, DynamicMessage => DynamicMessage])
      : ServerServiceDefinition = {
    val builder = ServerServiceDefinition.builder(name)
    shapes.foreach { case (rpc, _) =>
      val fn = fns(rpc)
      builder.addMethod(SumProto.methodDescriptor(rpc),
        ServerCalls.asyncUnaryCall(
          new ServerCalls.UnaryMethod[DynamicMessage, DynamicMessage] {
            override def invoke(req: DynamicMessage,
                obs: StreamObserver[DynamicMessage]): Unit =
              try { obs.onNext(fn(req)); obs.onCompleted() }
              catch {
                case e: Exception => obs.onError(Status.INTERNAL
                  .withDescription(s"internal: ${e.getMessage}").asException())
              }
          }))
    }
    builder.build()
  }

  private val server = {
    val effective = federation.fold(handlers)(f => handlers ++ masterOverrides(f))
    val builder = NettyServerBuilder
      .forAddress(new InetSocketAddress("127.0.0.1", port))
      .maxInboundMessageSize(MaxMessageBytes)
      .addService(buildService("sum.SumService", SumProto.rpcShapes, effective))
      .addService(buildService("sum.SumInternalService",
        SumProto.internalRpcShapes, internalHandlers))
      .addService(buildService("sum.SumMasterService",
        SumProto.masterRpcShapes, masterHandlers))
    credsPath.foreach { dir =>
      // GrpcSslContexts.forServer pre-configures ALPN/h2 on the builder;
      // the key must be PKCS#8 PEM (as sumd's Go credentials also expect
      // standard PEM material).
      builder.sslContext(GrpcSslContexts.forServer(
        new java.io.File(dir, "cert.pem"),
        new java.io.File(dir, "key.pem")).build())
    }
    builder.build()
  }

  /** Master mode runs the reference's background NodeUpdater for the
    * life of the server (cmd/sumd starts NodeUpdater alongside the
    * master service; updater.go): node statuses re-sync every 5 s like
    * the reference's default poll period.
    */
  private var nodeUpdater: Option[AutoCloseable] = None

  def start(): Unit = {
    server.start()
    nodeUpdater = federation.map(_.startUpdater(5000L))
  }
  def stop(): Unit = {
    nodeUpdater.foreach(_.close()); nodeUpdater = None
    server.shutdownNow(); server.awaitTermination()
  }
  def boundPort: Int = server.getPort
}

/** Minimal blocking client over the same runtime — what `sumcli` is to
  * `sumd`. Each call is one unary gRPC exchange of [[SumProto]] dynamic
  * messages on a shared channel: plaintext by default, TLS when
  * `certFile` names the server certificate to trust (the
  * NewClientTLSFromFile shape, master/node.go:64 — a self-signed server
  * cert works because trust is pinned to the file, not a CA chain).
  */
final class SumGrpcClient(host: String, port: Int,
    certFile: Option[String] = None) {
  private val channel = {
    val builder = NettyChannelBuilder.forAddress(host, port)
      .maxInboundMessageSize(50 * 1024 * 1024)
    certFile match {
      case Some(pem) => builder.sslContext(GrpcSslContexts.forClient()
        .trustManager(new java.io.File(pem)).build())
        // The test certs carry a localhost SAN; connections by IP
        // authority ("127.0.0.1") present no matching hostname, so pin
        // the TLS authority to the cert's name, as Go's
        // NewClientTLSFromFile(cert, "") infers it from the cert.
        .overrideAuthority("localhost")
      case None => builder.usePlaintext()
    }
    builder.build()
  }

  def call(rpc: String, req: DynamicMessage): DynamicMessage =
    ClientCalls.blockingUnaryCall(channel, SumProto.methodDescriptor(rpc),
      CallOptions.DEFAULT, req)

  /** Convenience builder for request messages. */
  def newMessage(messageName: String): DynamicMessage.Builder =
    DynamicMessage.newBuilder(SumProto.descriptor(messageName))

  def close(): Unit = { channel.shutdownNow(); () }
}
