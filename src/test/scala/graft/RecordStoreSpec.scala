package graft

import graft.model.SumRecord
import graft.store.{RecordStore, StoreErrors}

/** CRUD semantics parity with node/storage/index.go + records.go and the
  * pagination rules of node/service/records.go:66-114.
  */
class RecordStoreSpec extends SparkSpec {

  private def rec(data: Float*): SumRecord =
    SumRecord(0, data.toArray)

  test("create assigns sequential ids starting at 1") {
    val s = RecordStore.empty(spark)
    val r1 = s.create(rec(1f)).toOption.get
    val r2 = s.create(rec(2f)).toOption.get
    assert(r1.id === 1L && r2.id === 2L && s.nextId === 3L)
    assert(s.size === 2L)
  }

  test("shape defaults to 1-D [len] (records.go:126-129)") {
    val s = RecordStore.empty(spark)
    val r = s.create(rec(1f, 2f, 3f)).toOption.get
    assert(r.shape.toSeq === Seq(3L))
  }

  test("createWithId rejects duplicate ids with the reference error") {
    val s = RecordStore.empty(spark)
    assert(s.createWithId(SumRecord(7, Array(1f))).isRight)
    assert(s.createWithId(SumRecord(7, Array(2f))) === Left(StoreErrors.InvalidId))
    // nextId advances past caller-assigned ids
    assert(s.create(rec(9f)).toOption.get.id === 8L)
  }

  test("createManyWithId is all-or-nothing (index.go:190-218)") {
    val s = RecordStore.empty(spark)
    assert(s.createWithId(SumRecord(2, Array(1f))).isRight)
    val batch = Seq(SumRecord(1, Array(1f)), SumRecord(2, Array(2f)))
    assert(s.createManyWithId(batch) === Left(StoreErrors.InvalidId))
    assert(s.size === 1L) // nothing from the failed batch is visible
    assert(s.find(1L).isEmpty)
  }

  test("update patches only filled fields (record_driver.go:32-45)") {
    val s = RecordStore.empty(spark)
    val orig = s.create(SumRecord(0, Array(1f, 2f), Map("name" -> "a"))).toOption.get
    val patched = s.update(SumRecord(orig.id, Array.emptyFloatArray,
      Array.emptyLongArray, Map("name" -> "b"))).toOption.get
    assert(patched.data.toSeq === Seq(1f, 2f)) // data kept
    assert(patched.meta === Map("name" -> "b")) // meta replaced
    val fresh = s.find(orig.id).get
    assert(fresh.meta === Map("name" -> "b"))
  }

  test("update/delete of a missing record returns the reference message") {
    val s = RecordStore.empty(spark)
    assert(s.delete(666L) === Left("record 666 not found."))
    assert(s.update(SumRecord(666, Array(1f))) === Left("record 666 not found."))
  }

  test("delete returns the removed record and shrinks the store") {
    val s = RecordStore.empty(spark)
    val r = s.create(rec(5f)).toOption.get
    assert(s.delete(r.id).toOption.get.data.toSeq === Seq(5f))
    assert(s.size === 0L)
  }

  test("findBy distinguishes never-indexed key from empty result (records.go:103-123)") {
    val s = RecordStore.empty(spark)
    s.create(SumRecord(0, Array(1f), Map("lang" -> "en")))
    assert(s.findBy("nope", "x") === None)          // key never indexed -> nil
    assert(s.findBy("lang", "zz") === Some(Seq.empty)) // indexed, no match -> empty
    assert(s.findBy("lang", "en").get.map(_.id) === Seq(1L))
  }

  test("pagination clamps, ceils, sorts by id, and empties out-of-range pages") {
    val s = RecordStore.fromRecords(spark,
      (1L to 7L).map(i => SumRecord(i, Array(i.toFloat))))
    val p1 = s.list(0, 3) // page clamps to 1
    assert(p1.total === 7L && p1.pages === 3L)
    assert(p1.records.map(_.id) === Seq(1L, 2L, 3L))
    val p3 = s.list(3, 3) // partial page
    assert(p3.records.map(_.id) === Seq(7L))
    val p9 = s.list(9, 3) // out of range
    assert(p9.records.isEmpty && p9.total === 7L && p9.pages === 3L)
    val clamped = s.list(1, 0) // perPage clamps to 1
    assert(clamped.records.map(_.id) === Seq(1L) && clamped.pages === 7L)
  }

  test("concurrent creates assign unique sequential ids (records_test.go concurrency)") {
    val s = RecordStore.empty(spark)
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 4).foreach { i =>
        s.create(rec(t * 10f + i)) match {
          case Right(r) => ids.add(r.id)
          case Left(e)  => fail(s"create failed: $e")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(ids.size === 32) // all ids unique
    assert(s.size === 32L && s.nextId === 33L)
  }

  test("save/load round-trip restores records, nextId, and meta keys") {
    val dir = java.nio.file.Files.createTempDirectory("graft-store").toString + "/r"
    val s = RecordStore.empty(spark)
    s.create(SumRecord(0, Array(1f, 2f), Map("k" -> "v")))
    s.create(rec(3f))
    s.save(dir)
    val loaded = RecordStore.load(spark, dir)
    assert(loaded.size === 2L && loaded.nextId === 3L)
    assert(loaded.findBy("k", "v").get.map(_.id) === Seq(1L))
  }
}
