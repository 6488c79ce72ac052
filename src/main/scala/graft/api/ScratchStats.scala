package graft.api

/** Warm/cold evidence and generation coherence for the cross-process
  * scratch caches.
  *
  * Why this exists: every expensive deterministic build in the library
  * (scratch source writes, bucketed-table attach, pack/span/pair/cluster
  * parquet, k-means/PQ literal TSVs, finite stream-replay results, the
  * demo TxTables) is amortized across processes behind
  * `_GRAFT_OK`/`_GRAFT_FP` source-fingerprint markers. That makes a
  * bench run's cost a function of INVISIBLE disk state: the round-12
  * gate artifact read 67.9 s / 503.6 s executor CPU on code that
  * reproduces at 33.7 s / 109.6 s, because its window started with
  * /tmp/graft_io cold while /dev/shm/graft-bucketed was warm — the
  * duplicated first-touch rebuilds were real CPU, so neither the
  * contention flag nor the CPU column could defend the number. Two
  * fixes live here:
  *
  *  - '''Per-marker evidence''' ([[record]]/[[snapshot]]): every
  *    marker-freshness decision reports itself, so the bench artifact
  *    carries `scratch_warm`/`scratch_cold` name lists — a mixed-state
  *    run names its own state instead of reading like a regression.
  *  - '''Generation coherence''' ([[ensureCoherentGeneration]]): the
  *    two scratch roots live on filesystems that are cleaned
  *    INDEPENDENTLY (/dev/shm is RAM, gone on reboot; /tmp survives
  *    reboots but is subject to tmp-cleaners), which is exactly how the
  *    half-cold state arises. A `_GRAFT_GEN` stamp written to both
  *    roots as a pair makes the check binary: stamps match → warm state
  *    is trustworthy; anything else → BOTH roots are wiped and
  *    re-stamped, so the run is fully cold and says so. Correctness
  *    never depends on this (the per-cache fingerprints already force
  *    rebuilds); it exists so cold/warm is all-or-nothing for
  *    measurement.
  */
object ScratchStats {

  /** Root of the per-SF scratch source writes ([[graft.ops.Sources]]).
    * Deliberately NOT under [[Bucketing.scratchBase]]: the DuckDB
    * oracle reads these files by literal path in registered SQL, and
    * /dev/shm capacity is better spent on the shuffle-heavy indexes.
    */
  private[graft] val IoRoot = "/tmp/graft_io"

  /** Both scratch roots, in a fixed order. */
  def roots: Seq[String] = Seq(IoRoot, Bucketing.scratchBase)

  private val warm = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val cold = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Human-readable, collision-safe corpus tag for recorded evidence:
    * the dir's basename (what a reader recognizes) plus a short slice
    * of the same sha tag the scratch paths themselves are keyed by
    * (what keeps two same-named dirs from aliasing).
    */
  private def dirTag(dir: String): String = {
    val base = dir.stripSuffix("/").split('/').lastOption.getOrElse(dir)
    s"$base-${Dedup.tableTag(dir).take(6)}"
  }

  /** Report one marker-freshness decision for a cache of corpus `dir`:
    * `servedFromDisk` = the cross-process cache was fresh and attached;
    * false = it was (re)built this process. First decision wins per
    * recorded name — later in-session hits are memo reads, not disk
    * decisions. The name is tagged with the dir (the same keying the
    * scratch paths use): a process touching TWO corpora legitimately
    * decides the same cache kind warm for one and cold for the other,
    * and without the tag one name would land in both lists and muddy
    * the artifact this evidence exists to clarify.
    */
  private[graft] def record(name: String, dir: String,
                            servedFromDisk: Boolean): Unit = {
    (if (servedFromDisk) warm else cold).add(s"$name@${dirTag(dir)}"); ()
  }

  /** (warm names, cold names), each sorted. */
  def snapshot: (List[String], List[String]) = {
    import scala.jdk.CollectionConverters._
    (warm.asScala.toList.sorted, cold.asScala.toList.sorted)
  }

  /** Drop recorded evidence (test hygiene; never needed in production —
    * the sets are per-process and bounded by the cache-name inventory).
    */
  private[graft] def reset(): Unit = { warm.clear(); cold.clear() }

  private def stampPath(root: String) =
    java.nio.file.Paths.get(root, "_GRAFT_GEN")

  private def readStamp(root: String): Option[String] =
    try {
      val p = stampPath(root)
      if (java.nio.file.Files.isRegularFile(p))
        Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim)
          .filter(_.nonEmpty)
      else None
    } catch { case _: Exception => None }

  private def deleteTree(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally s.close()
    }
  }

  /** Make the scratch state binary for a measurement run: if both roots
    * carry the SAME `_GRAFT_GEN` stamp the state is coherent (warm
    * entries are from one generation); otherwise — one root cleaned, a
    * first run, or pre-stamp scratch — BOTH roots are wiped and
    * re-stamped, so every build this run is honestly cold. Returns
    * (generation, wiped): `wiped=true` means pre-existing scratch was
    * destroyed (a fresh machine with neither root reports false).
    *
    * Single-caller-per-window by design (the bench main, before any
    * build): wiping while another process is mid-write would strand its
    * markers — the per-cache fingerprints still force a correct rebuild,
    * but the measurement that motivated the wipe is lost.
    */
  def ensureCoherentGeneration(): (String, Boolean) = {
    val stamps = roots.map(readStamp)
    if (stamps.forall(_.isDefined) && stamps.distinct.size == 1)
      (stamps.head.get, false)
    else {
      val hadScratch = roots.exists(r =>
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(r)))
      roots.foreach(deleteTree)
      val gen = java.util.UUID.randomUUID().toString.take(16)
      roots.foreach { r =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(r))
        java.nio.file.Files.write(stampPath(r), gen.getBytes("UTF-8"))
      }
      (gen, hadScratch)
    }
  }
}
