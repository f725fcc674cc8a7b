package graft.store

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.model.SumRecord

/** Errors with the reference's exact message strings. */
object StoreErrors {
  /** node/storage/index.go ErrInvalidID. */
  val InvalidId = "identifier is not unique"
  def recordNotFound(id: Long): String = s"record $id not found."
  def oracleNotFound(id: Long): String = s"oracle $id not found."
  def oracleNotFoundByName(name: String): String = s"oracle $name not found."
}

/** One page of a sorted record listing (node/service/records.go:66-114). */
final case class RecordPage(total: Long, pages: Long, records: Seq[SumRecord])

/** Mutable record store with the reference's CRUD semantics
  * (node/storage/index.go, records.go) over an immutable Spark Dataset.
  *
  * Design: copy-on-write. The current state is one cached
  * `Dataset[SumRecord]`; every mutation derives a new Dataset (union /
  * anti-filter / per-field coalesce) and atomically swaps it in. Sequential
  * id assignment and the "which meta keys were ever indexed" set — the two
  * pieces of genuinely driver-side state the reference keeps
  * (index.go:154-172, records.go:8-48) — live here under a lock; everything
  * else is a distributed plan. Batch mutations (createManyWithId) validate
  * first and swap once, which is what makes the reference's rollback
  * semantics (index.go:190-218) free: a failed batch never becomes visible.
  *
  * At cluster scale the same class works unchanged: the Dataset is
  * partitioned storage, point lookups are pushdown filters on the id
  * column, and persistence is parquet (replacing the reference's
  * one-protobuf-file-per-record layout, node/storage/saver.go:12-20).
  */
final class RecordStore private (
    val spark: SparkSession,
    private var ds: Dataset[SumRecord],
    private var nextIdVal: Long,
    private var metaKeys: Set[String]) {

  import spark.implicits._

  private def swap(next: Dataset[SumRecord]): Unit = synchronized {
    val cached = next.persist(StorageLevel.MEMORY_AND_DISK)
    cached.count() // materialize before dropping the old lineage
    val old = ds
    ds = cached
    old.unpersist()
  }

  def records: Dataset[SumRecord] = ds

  /** Release the store's cached blocks (the persist taken by swap/
    * fromDataset/load). Call when done with a short-lived store — each
    * query-scoped store otherwise pins its cached dataset for the app
    * lifetime. The store must not be used afterwards.
    */
  def close(): Unit = synchronized { ds.unpersist(); () }

  /** The same records re-bucketed into `n` partitions — the Spark form of
    * the reference master's transfer/balance verbs (each partition is a
    * "node"; re-sharding is a repartition, not a data migration).
    */
  def repartitioned(n: Int): RecordStore = synchronized {
    new RecordStore(spark, ds.repartition(n), nextIdVal, metaKeys)
  }

  def size: Long = ds.count()

  def nextId: Long = synchronized(nextIdVal)

  /** Insert with a server-assigned sequential id (index.go:154-172). */
  def create(record: SumRecord): Either[String, SumRecord] = synchronized {
    val assigned = SumRecord.withDefaultShape(record).copy(id = nextIdVal)
    createWithId(assigned).map { r => r }
  }

  /** Insert with the caller's id; fails when the id exists (index.go:174-188). */
  def createWithId(record: SumRecord): Either[String, SumRecord] = synchronized {
    val rec = SumRecord.withDefaultShape(record)
    if (find(rec.id).isDefined) Left(StoreErrors.InvalidId)
    else {
      swap(ds.union(spark.createDataset(Seq(rec))))
      if (rec.id >= nextIdVal) nextIdVal = rec.id + 1
      metaKeys ++= rec.meta.keys
      Right(rec)
    }
  }

  /** Batch insert; all-or-nothing like the reference's rollback
    * (index.go:190-218) — validation happens before the single swap.
    */
  def createManyWithId(recs: Seq[SumRecord]): Either[String, Long] = synchronized {
    val normalized = recs.map(SumRecord.withDefaultShape)
    val ids = normalized.map(_.id)
    val clash = ids.distinct.size != ids.size ||
      ds.filter(col("id").isin(ids: _*)).limit(1).count() > 0
    if (clash) Left(StoreErrors.InvalidId)
    else {
      swap(ds.union(spark.createDataset(normalized)))
      nextIdVal = math.max(nextIdVal, ids.max + 1)
      metaKeys ++= normalized.flatMap(_.meta.keys)
      Right(normalized.size.toLong)
    }
  }

  /** Partial update: only the filled fields of `patch` overwrite the stored
    * record (RecordDriver.Copy, node/storage/record_driver.go:32-45).
    */
  def update(patch: SumRecord): Either[String, SumRecord] = synchronized {
    find(patch.id) match {
      case None => Left(StoreErrors.recordNotFound(patch.id))
      case Some(old) =>
        val merged = old.copy(
          data = if (patch.data != null && patch.data.nonEmpty) patch.data else old.data,
          shape = if (patch.shape != null && patch.shape.nonEmpty) patch.shape else old.shape,
          meta = if (patch.meta != null && patch.meta.nonEmpty) patch.meta else old.meta)
        swap(ds.filter(col("id") =!= patch.id)
          .union(spark.createDataset(Seq(merged))))
        metaKeys ++= merged.meta.keys
        Right(merged)
    }
  }

  /** Point lookup (index.go:239-248). */
  def find(id: Long): Option[SumRecord] =
    ds.filter(col("id") === id).limit(1).collect().headOption

  /** Remove by id, returning the removed record (index.go:253-270). */
  def delete(id: Long): Either[String, SumRecord] = synchronized {
    find(id) match {
      case None => Left(StoreErrors.recordNotFound(id))
      case Some(r) =>
        swap(ds.filter(col("id") =!= id))
        Right(r)
    }
  }

  def deleteMany(ids: Seq[Long]): Long = synchronized {
    val before = size
    swap(ds.filter(!col("id").isin(ids: _*)))
    before - size
  }

  /** Equality filter on one metadata key. Returns None — distinct from an
    * empty result — when the key was never indexed, matching the
    * reference's nil-vs-empty contract (node/storage/records.go:103-123).
    *
    * Materializes to the driver (reference-parity API: sum returns the
    * matched records), so the result is capped at
    * [[RecordStore.MaxCollectRowsKey]] rows — a loud error beats an OOM
    * when the API is pointed at corpus-scale data. The scale-safe form
    * is [[findByDs]].
    */
  def findBy(key: String, value: String): Option[Seq[SumRecord]] =
    findByDs(key, value).map { matched =>
      val cap = RecordStore.maxCollectRows(spark)
      val rows = matched.limit(cap + 1).collect().toSeq
      if (rows.length > cap) throw new IllegalStateException(
        s"findBy matched more than $cap records; use findByDs or raise " +
          RecordStore.MaxCollectRowsKey)
      rows
    }

  /** Dataset-returning [[findBy]]: the same nil-vs-empty contract with no
    * driver materialization — compose further operators on the result at
    * any store size.
    */
  def findByDs(key: String, value: String): Option[Dataset[SumRecord]] =
    if (!metaKeys.contains(key)) None
    else Some(ds.filter(element_at(col("meta"), key) === value))

  /** Id-sorted pagination with the reference's exact clamp/ceil/slice rules
    * (node/service/records.go:66-114): page and perPage clamp to >= 1;
    * pages = ceil(total / perPage); an out-of-range page returns totals
    * with no records.
    */
  def list(pageReq: Long, perPageReq: Long): RecordPage = {
    val page = math.max(pageReq, 1L)
    val perPage = math.max(perPageReq, 1L)
    val cap = RecordStore.maxCollectRows(spark)
    // The page itself is driver-materialized (reference-parity), so the
    // page SIZE is what must stay bounded — not the store.
    if (perPage > cap) throw new IllegalStateException(
      s"page size $perPage exceeds $cap; use listDs or raise " +
        RecordStore.MaxCollectRowsKey)
    val total = size
    val start = (page - 1) * perPage
    val pages = total / perPage + (if (total % perPage > 0) 1 else 0)
    if (total <= start) RecordPage(total, pages, Seq.empty)
    else RecordPage(total, pages,
      ds.orderBy(col("id")).offset(start.toInt).limit(perPage.toInt).collect().toSeq)
  }

  /** Dataset-returning [[list]]: same clamp/ceil/slice rules, but the page
    * stays a distributed plan (global sort + offset + limit — Spark plans
    * the offset+limit as a single-pass skip, no driver pull).
    */
  def listDs(pageReq: Long, perPageReq: Long): (Long, Long, Dataset[SumRecord]) = {
    val page = math.max(pageReq, 1L)
    val perPage = math.max(perPageReq, 1L)
    val total = size
    val start = (page - 1) * perPage
    val pages = total / perPage + (if (total % perPage > 0) 1 else 0)
    if (total <= start) (total, pages, ds.limit(0))
    else (total, pages,
      ds.orderBy(col("id")).offset(start.toInt).limit(perPage.toInt))
  }

  /** Persist as parquet (replaces the reference's .dat-per-record layout). */
  def save(path: String): Unit =
    ds.write.mode(SaveMode.Overwrite).parquet(path)
}

object RecordStore {

  /** Conf key capping driver-materializing record reads (default 100000):
    * [[RecordStore.findBy]] results and [[RecordStore.list]] page sizes.
    */
  val MaxCollectRowsKey = "graft.store.maxCollectRows"

  private[graft] def maxCollectRows(spark: SparkSession): Int =
    spark.conf.get(MaxCollectRowsKey, "100000").toInt

  def empty(spark: SparkSession): RecordStore = {
    import spark.implicits._
    new RecordStore(spark, spark.emptyDataset[SumRecord], 1L, Set.empty)
  }

  /** Wrap an existing distributed Dataset as a store WITHOUT pulling it to
    * the driver — the ingest path for lake-resident corpora (two KB-sized
    * aggregates compute nextId and the meta key set, as [[load]] does).
    */
  def fromDataset(spark: SparkSession,
      records: Dataset[SumRecord]): RecordStore = {
    import spark.implicits._
    val ds = records.map(SumRecord.withDefaultShape)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val maxId = ds.agg(max(col("id"))).collect().head match {
      case row if row.isNullAt(0) => 0L
      case row                    => row.getLong(0)
    }
    val keys = ds.select(explode(map_keys(col("meta"))).as("k"))
      .distinct().as[String].collect().toSet
    new RecordStore(spark, ds, maxId + 1, keys)
  }

  def fromRecords(spark: SparkSession, recs: Seq[SumRecord]): RecordStore = {
    val s = empty(spark)
    s.createManyWithId(recs.map(SumRecord.withDefaultShape)) match {
      case Left(err) => throw new IllegalArgumentException(err)
      case Right(_)  => s
    }
  }

  /** Load a persisted store; nextId becomes max(id)+1 and the meta key set
    * is rebuilt, as the reference does on boot (index.go:72-102).
    */
  def load(spark: SparkSession, path: String): RecordStore = {
    import spark.implicits._
    val ds = spark.read.schema(SumRecord.schema).parquet(path).as[SumRecord]
      .persist(StorageLevel.MEMORY_AND_DISK)
    val maxId = ds.agg(max(col("id"))).collect().head match {
      case row if row.isNullAt(0) => 0L
      case row                    => row.getLong(0)
    }
    val keys = ds.select(explode(map_keys(col("meta"))).as("k"))
      .distinct().as[String].collect().toSet
    new RecordStore(spark, ds, maxId + 1, keys)
  }
}
