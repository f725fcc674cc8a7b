package graft.service

import scala.collection.mutable.ArrayBuffer

import org.json4s.JValue

import graft.oracle.{Merge, OracleRegistry, Payload}

/** The reference MASTER's node-federation semantics, in process
  * (master/mux_nodes.go, master/balancer.go, master/oracle_stealer.go,
  * master/mux_runner.go) — the one reference surface the single-engine
  * mapping answered truthfully instead of implementing. Each federated
  * node is a full engine ([[SumService]]: its own RecordStore shard +
  * oracle registry); the master holds the oracle cage and coordinates:
  *
  *  - `addNode` attaches an engine, lifts the master's next-record-id
  *    watermark (mux_nodes.go:19 setNextIdIfHigher), REBALANCES, and
  *    absorbs the node's stored oracles into the cage, deleting them
  *    from the node (oracle_stealer.go:18-68 "agent Smith");
  *  - `balance` implements balancer.go:62-135 exactly: per-node targets
  *    = total/n (+1 for the first total%n nodes), 5% hysteresis (skip
  *    unless some node needs more than target/20), then greedy pairwise
  *    transfers from donors to takers;
  *  - `transfer` is balancer.go:10-59's protocol over the engine faces:
  *    ListRecords(page 1, perPage n) from the donor ->
  *    CreateRecordsWithId on the taker -> DeleteRecords on the donor
  *    (create-before-delete, so a failed create loses nothing);
  *  - `deleteNode` removes a node and redistributes its records across
  *    the survivors per-node + remainder (mux_nodes.go:50-94);
  *  - `run` is the master Run pipeline (mux_runner.go:39-156): create
  *    the oracle as a TEMPORARY oracle on every node, run it with the
  *    caller's args, gather per-node JSON partials, aggregate failures
  *    in the exact wire format "Errors from nodes: [...]", merge through
  *    the stored `merge*` hook or the default tri-state merger, and
  *    clean the temporaries up whatever happened.
  *
  * In-process means both engines share a JVM (Spark executors remain
  * each engine's internal shard layer); the protocol, message formats,
  * and rebalancing arithmetic are the reference's own.
  */
final class SumFederation {

  final class FedNode(val id: Long, val name: String, val engine: SumService) {
    def records: Long = engine.store.size
    def nextRecordId: Long = engine.store.nextId
    override def toString = s"node $id ($name): ${records} records"
  }

  /** The master's raccoon cage (mux_runner.go:22-31). */
  val oracles = new OracleRegistry

  private val nodes = ArrayBuffer.empty[FedNode]
  private var nextNodeId = 1L
  private var nextRecordId = 1L

  def listNodes(): Seq[FedNode] = synchronized(nodes.toSeq)

  private def setNextIdIfHigher(id: Long): Unit =
    if (id > nextRecordId) nextRecordId = id

  def addNode(name: String, engine: SumService): NodeResponse = synchronized {
    setNextIdIfHigher(engine.store.nextId)
    val n = new FedNode(nextNodeId, name, engine)
    nodes += n
    nextNodeId += 1
    balance()
    stealOraclesFromNode(n)
    NodeResponse(success = true, n.id.toString)
  }

  def deleteNode(id: Long): NodeResponse = synchronized {
    nodes.find(_.id == id) match {
      case None => NodeResponse(success = false, s"node $id not found.")
      case Some(n) =>
        nodes -= n
        val nRecords = n.records
        val nNodes = nodes.length
        if (nNodes > 0 && nRecords > 0) {
          val perNode = nRecords / nNodes
          val remainder = nRecords % nNodes
          nodes.zipWithIndex.foreach { case (n1, i) =>
            transfer(n, n1, perNode + (if (i < remainder) 1 else 0))
          }
        }
        NodeResponse(success = true, "")
    }
  }

  /** balancer.go:10-59: move the donor's FIRST n records (list page 1 is
    * id-ordered) onto the taker, create-before-delete.
    */
  private def transfer(from: FedNode, to: FedNode, nRecords: Long): Unit = {
    if (nRecords <= 0) return
    val list = from.engine.listRecords(page = 1, perPage = nRecords)
    val recs = list.records
    if (recs.isEmpty) return
    val created = to.engine.createRecordsWithId(recs)
    if (!created.success) return // like the reference: log-and-keep the donor intact
    from.engine.deleteRecords(recs.map(_.id))
    setNextIdIfHigher(recs.map(_.id).max + 1)
  }

  /** balancer.go:62-135, arithmetic verbatim: remainder-adjusted targets,
    * 5% hysteresis on target/20, greedy donor->taker transfers.
    */
  def balance(): Unit = synchronized {
    val counts = nodes.map(_.records)
    val totRecords = counts.sum
    val nNodes = nodes.length
    if (totRecords == 0 || nNodes == 0) return
    val targetPerNode = totRecords / nNodes
    val remainder = (totRecords % nNodes).toInt
    val targets = Array.tabulate(nNodes)(i =>
      targetPerNode + (if (i < remainder) 1 else 0))
    val deltas = Array.tabulate(nNodes)(i => targets(i) - counts(i))
    if (!deltas.exists(_ > targetPerNode / 20)) return // 5% hysteresis
    for (i <- deltas.indices if deltas(i) > 0) {
      var need = deltas(i)
      for (j <- deltas.indices if need > 0 && deltas(j) < 0) {
        val n = math.min(-deltas(j), need)
        if (n > 0) {
          transfer(nodes(j), nodes(i), n)
          need -= n
          deltas(i) -= n
          deltas(j) += n
        }
      }
    }
  }

  /** oracle_stealer.go:18-68: absorb each of the node's oracles into the
    * cage (skipping code the cage already holds) and delete it from the
    * node — nodes execute, the master owns the oracle inventory.
    */
  private def stealOraclesFromNode(n: FedNode): Unit = {
    val (_, _, nodeOracles) = n.engine.oracles.list(1, 1000000L)
    nodeOracles.foreach { o =>
      val (_, _, mine) = oracles.list(1, 1000000L)
      val already = mine.exists(m => m.name == o.name && m.code == o.code)
      if (already || oracles.create(o.copy(id = 0)).isRight)
        n.engine.deleteOracle(o.id)
    }
  }

  /** mux_runner.go:39-156: fan the oracle out as node-temporaries, run,
    * gather, merge; per-node failures aggregate in the master's wire
    * format and temporaries are deleted on every path.
    */
  def run(oracleId: Long, jsonArgs: Seq[String]): CallResponse = {
    val oracle = oracles.read(oracleId) match {
      case Left(_)  => return CallResponse(success = false,
        s"oracle $oracleId not found.", None)
      case Right(o) => o
    }
    val snapshot = synchronized(nodes.toSeq)
    val temp = ArrayBuffer.empty[(FedNode, Long)]
    try {
      val outcomes: Seq[Either[String, JValue]] = snapshot.map { n =>
        n.engine.createOracle(oracle.copy(id = 0)) match {
          case or if !or.success => Left(or.msg)
          case or =>
            val tempId = or.msg.toLong
            temp += ((n, tempId))
            val resp = n.engine.run(tempId, jsonArgs)
            if (!resp.success) Left(resp.msg)
            else Right(org.json4s.jackson.JsonMethods.parse(
              Payload.openString(resp.data.get)))
        }
      }
      val errs = outcomes.collect { case Left(m) => m }
      if (errs.nonEmpty)
        return CallResponse(success = false,
          s"Errors from nodes: [${errs.mkString(", ")}]", None)
      val partials = outcomes.collect { case Right(v) => v }
      Merge.merge(partials, oracle.merger) match {
        case Left(msg) => CallResponse(success = false,
          s"Unable to merge results from nodes: $msg", None)
        case Right(v) => CallResponse(success = true, "",
          Some(Payload.buildString(org.json4s.jackson.JsonMethods.compact(
            org.json4s.jackson.JsonMethods.render(v)))))
      }
    } finally temp.foreach { case (n, id) => n.engine.deleteOracle(id) }
  }
}
