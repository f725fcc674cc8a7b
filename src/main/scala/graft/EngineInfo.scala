package graft

import org.apache.spark.sql.SparkSession

import graft.oracle.OracleRegistry
import graft.store.RecordStore

/** Runtime/telemetry snapshot — parity with the reference's Service.Info
  * (node/service/service.go:102-104, info.go:15-44): version, cpu count,
  * record/oracle counts, next record id, plus Spark-native extras from the
  * status tracker.
  */
final case class EngineInfo(
    version: String,
    cpus: Int,
    records: Long,
    oracles: Long,
    nextRecordId: Long,
    sparkVersion: String,
    activeJobs: Int,
    executors: Int)

object EngineInfo {
  val Version = "0.1.0"

  def apply(spark: SparkSession, store: RecordStore, registry: OracleRegistry): EngineInfo = {
    val tracker = spark.sparkContext.statusTracker
    EngineInfo(
      version = Version,
      cpus = Runtime.getRuntime.availableProcessors(),
      records = store.size,
      oracles = registry.size.toLong,
      nextRecordId = store.nextId,
      sparkVersion = spark.version,
      activeJobs = tracker.getActiveJobIds().length,
      executors = tracker.getExecutorInfos.length)
  }
}
