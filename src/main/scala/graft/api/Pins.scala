package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-keyed registry for frames persisted INSIDE an operator
  * (never handed to the caller, so the caller cannot unpersist them).
  * [[graft.Graft.clear]] drains a session's pins; independently, a
  * per-session cap bounds what an un-hygienic long-lived caller can
  * accumulate — once a session holds `MaxPerSession` pins, the OLDEST
  * is unpersisted and dropped (safe: an unpersisted frame silently
  * recomputes if some lazy plan still references it). Memory-tier
  * blocks also fall to Spark's LRU, but DISK-tier spill does NOT —
  * without the cap, a loop of dedup calls that never clears would fill
  * local disk.
  */
private[graft] object Pins {
  // 256: the full concurrent query suite now registers well over 64
  // pins (vocab/model/cut/graph frames joined the original dedup
  // frames) — at the old cap the oldest pins were evicted MID-SUITE
  // and their still-referenced plans silently recomputed, exactly the
  // duplicated work pinning exists to prevent. Still a hard bound on
  // disk-tier spill for un-hygienic long-lived callers.
  private[api] val MaxPerSession = 256
  private val pinned =
    scala.collection.mutable.Buffer.empty[(Int, DataFrame)]

  def pin(df: DataFrame): DataFrame = pinned.synchronized {
    val id = System.identityHashCode(df.sparkSession)
    if (pinned.count(_._1 == id) >= MaxPerSession) {
      val i = pinned.indexWhere(_._1 == id)
      pinned.remove(i)._2.unpersist()
    }
    pinned += ((id, df)); df
  }

  def clear(s: SparkSession): Unit = pinned.synchronized {
    val id = System.identityHashCode(s)
    val (mine, rest) = pinned.partition(_._1 == id)
    mine.foreach(_._2.unpersist())
    pinned.clear(); pinned ++= rest
  }
}
