package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The Pins registry's BYTE bound (round 22): a long-lived session's
  * pinned frames must be evicted oldest-first once the context's
  * persisted bytes exceed `spark.graft.pins.maxBytes` — the slot cap
  * alone is count-, not size-aware, and 256 corpus-scale
  * MEMORY_AND_DISK index frames would otherwise hold unbounded disk
  * spill (VERDICT r21 item 5).
  */
class PinsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("pin evicts oldest-first once persisted bytes exceed the cap") {
    // child session: the cap conf is session-scoped and Pins keys its
    // registry by session identity, so the main suite's pins are
    // untouched
    val s = spark.newSession()
    s.conf.set(graft.api.Pins.MaxBytesConf, "1")
    val a = s.range(10000).toDF("a").persist(StorageLevel.MEMORY_AND_DISK)
    graft.api.Pins.pin(a)
    a.count() // materialize, so persistedBytes sees it
    assert(a.storageLevel !== StorageLevel.NONE)
    // a DIFFERENT plan: an identical one would share a's cache entry
    // (CacheManager plan-matches ignoring aliases) and die with it
    val b = s.range(20000).toDF("b").persist(StorageLevel.MEMORY_AND_DISK)
    // registering b finds the context over the (1-byte) cap and must
    // give back this session's oldest pin — a — before taking the slot
    graft.api.Pins.pin(b)
    assert(a.storageLevel === StorageLevel.NONE,
      "oldest pin must be unpersisted once the byte cap is exceeded")
    assert(b.storageLevel !== StorageLevel.NONE,
      "the newly pinned frame keeps its storage level")
    graft.Graft.clear(s)
  }

  test("default cap leaves small pins alone") {
    val s = spark.newSession()
    val a = s.range(1000).toDF("a").persist(StorageLevel.MEMORY_AND_DISK)
    graft.api.Pins.pin(a)
    a.count()
    val b = s.range(2000).toDF("b").persist(StorageLevel.MEMORY_AND_DISK)
    graft.api.Pins.pin(b)
    assert(a.storageLevel !== StorageLevel.NONE,
      "tiny frames must never trip the default (4x heap) cap")
    graft.Graft.clear(s)
  }
}
