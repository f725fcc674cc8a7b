package graft.service

import org.apache.spark.sql.SparkSession
import org.json4s.JValue

import graft.EngineInfo
import graft.model.SumRecord
import graft.oracle.{Oracle, OracleRegistry, Payload}
import graft.store.{RecordStore, StoreErrors}

/** Response envelopes mirroring proto/sum.proto: success flag + message,
  * plus the typed payloads. Errors are responses, not exceptions, exactly
  * like the reference service (node/service/records.go:11-16).
  */
final case class RecordResponse(success: Boolean, msg: String,
    record: Option[SumRecord] = None)
final case class RecordListResponse(total: Long, pages: Long,
    records: Seq[SumRecord])
final case class FindResponse(success: Boolean, msg: String,
    records: Seq[SumRecord])
final case class OracleResponse(success: Boolean, msg: String,
    oracle: Option[Oracle] = None)
final case class OracleListResponse(total: Long, pages: Long,
    oracles: Seq[Oracle])
final case class CallResponse(success: Boolean, msg: String,
    data: Option[Payload.Envelope])

/** The reference's public `SumService` surface (proto/sum.proto:5-25) as a
  * thin facade over the store + registry: all 14 RPCs with the reference's
  * response semantics — errors as `{success: false, msg}` with the exact
  * message strings, id echoes in `msg` on create/update, and the gzip
  * result envelope on Run. The internal/master services (sharding,
  * node membership) have no facade: Spark's driver/executor model covers
  * them (SURVEY.md §2.5).
  */
final class SumService(
    val spark: SparkSession,
    val store: RecordStore,
    val oracles: OracleRegistry) {

  // ---- records -----------------------------------------------------------

  def createRecord(r: SumRecord): RecordResponse =
    store.create(r) match {
      case Left(err)  => RecordResponse(success = false, err)
      case Right(rec) => RecordResponse(success = true, rec.id.toString, Some(rec))
    }

  def updateRecord(r: SumRecord): RecordResponse =
    store.update(r) match {
      case Left(err)  => RecordResponse(success = false, err)
      case Right(rec) => RecordResponse(success = true, rec.id.toString, Some(rec))
    }

  def readRecord(id: Long): RecordResponse =
    store.find(id) match {
      case None      => RecordResponse(success = false, StoreErrors.recordNotFound(id))
      case Some(rec) => RecordResponse(success = true, "record found", Some(rec))
    }

  def listRecords(page: Long, perPage: Long): RecordListResponse = {
    val p = store.list(page, perPage)
    RecordListResponse(p.total, p.pages, p.records)
  }

  def deleteRecord(id: Long): RecordResponse =
    store.delete(id) match {
      case Left(err)  => RecordResponse(success = false, err)
      case Right(rec) => RecordResponse(success = true, "", Some(rec))
    }

  def findRecords(metaKey: String, value: String): FindResponse =
    store.findBy(metaKey, value) match {
      case None => FindResponse(success = false,
        s"meta index $metaKey not found.", Seq.empty)
      case Some(recs) => FindResponse(success = true, "", recs)
    }

  // ---- oracles -----------------------------------------------------------

  def createOracle(o: Oracle): OracleResponse =
    oracles.create(o) match {
      case Left(err) => OracleResponse(success = false, err)
      case Right(oc) => OracleResponse(success = true, oc.id.toString, Some(oc))
    }

  def updateOracle(o: Oracle): OracleResponse =
    oracles.update(o) match {
      case Left(err) => OracleResponse(success = false, err)
      case Right(oc) => OracleResponse(success = true, oc.id.toString, Some(oc))
    }

  def readOracle(id: Long): OracleResponse =
    oracles.read(id) match {
      case Left(err) => OracleResponse(success = false, err)
      case Right(oc) => OracleResponse(success = true, "", Some(oc))
    }

  def listOracles(page: Long, perPage: Long): OracleListResponse = {
    val (total, pages, page1) = oracles.list(page, perPage)
    OracleListResponse(total, pages, page1)
  }

  def findOracle(name: String): OracleResponse =
    oracles.findByName(name) match {
      case Left(err) => OracleResponse(success = false, err)
      case Right(oc) => OracleResponse(success = true, "", Some(oc))
    }

  def deleteOracle(id: Long): OracleResponse =
    oracles.delete(id) match {
      case Left(err) => OracleResponse(success = false, err)
      case Right(oc) => OracleResponse(success = true, "", Some(oc))
    }

  // ---- execution ---------------------------------------------------------

  /** Run an oracle by id with JSON-encoded args; results above 2 KiB are
    * gzip-enveloped (node/service/service.go:106-124,128-154).
    */
  def run(oracleId: Long, jsonArgs: Seq[String]): CallResponse =
    oracles.run(oracleId, store, jsonArgs) match {
      case Left(err)   => CallResponse(success = false, err, None)
      case Right(json) => CallResponse(success = true, "",
        Some(Payload.buildString(json)))
    }

  def info(): EngineInfo = EngineInfo(spark, store, oracles)
}

object SumService {
  /** A service over an empty store with the canonical oracles registered. */
  def apply(spark: SparkSession): SumService = {
    val reg = new OracleRegistry
    graft.oracle.CanonicalOracles.registerAll(reg)
    new SumService(spark, RecordStore.empty(spark), reg)
  }
}
