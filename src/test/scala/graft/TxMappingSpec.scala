package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{TxMapping, TxTable}

/** ALTER TABLE RENAME/DROP COLUMN via column mapping (round 20): the
  * logical name moves in ONE data-less commit while the physical name
  * — what files and skipping metadata carry — never changes; DROP
  * retires the physical name so re-adding the logical name can never
  * resurrect the dropped bytes.
  */
class TxMappingSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def freshCat(tag: String): (String, String) = {
    val w = java.nio.file.Files.createTempDirectory(s"txmap$tag").toString
    val cat = "gm" + tag
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.api.TxCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    (cat, w)
  }
  private def sql(q: String) = spark.sql(q)

  test("RENAME COLUMN: metadata-only, old files read, appends keep working") {
    val (cat, w) = freshCat("rn")
    sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)")
    sql(s"INSERT INTO $cat.t VALUES (1,'a'),(2,'b')")
    val preFiles = TxTable.snapshotState(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t")).files.toSet
    sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
    // data-less: no file moved or added
    val post = TxTable.snapshotState(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t"))
    assert(post.files.toSet === preFiles, "rename moved zero bytes")
    assert(spark.table(s"$cat.t").columns.toSeq === Seq("id", "label"))
    assert(sql(s"SELECT label FROM $cat.t WHERE id = 1").collect()
      .map(_.getString(0)).toSeq === Seq("a"),
      "pre-rename files read under the new logical name")
    // appends land under the IMMUTABLE physical name and read back
    sql(s"INSERT INTO $cat.t VALUES (3,'c')")
    assert(sql(s"SELECT label FROM $cat.t ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    // time travel below the rename reads the OLD logical name
    val v1 = sql(s"SELECT * FROM $cat.t VERSION AS OF 2")
    assert(v1.columns.toSeq === Seq("id", "v"),
      s"time travel keeps the old shape: ${v1.columns.toSeq}")
    assert(v1.orderBy("id").collect().map(_.getString(1)).toSeq ===
      Seq("a", "b"))
    // the mapping never leaks into the user-facing schema
    assert(!spark.table(s"$cat.t").schema.fields.exists(
      _.metadata.contains(TxMapping.PhysKey)))
  }

  test("RENAME validation: reserved, duplicate, missing") {
    val (cat, _) = freshCat("rv")
    sql(s"CREATE TABLE $cat.t (a BIGINT, b BIGINT)")
    intercept[Exception](sql(s"ALTER TABLE $cat.t RENAME COLUMN a TO _pos"))
    intercept[Exception](sql(s"ALTER TABLE $cat.t RENAME COLUMN a TO b"))
    intercept[Exception](sql(s"ALTER TABLE $cat.t RENAME COLUMN zz TO y"))
    assert(spark.table(s"$cat.t").columns.toSeq === Seq("a", "b"))
  }

  test("rename CHAINS and SWAPS stay exact") {
    val (cat, _) = freshCat("sw")
    sql(s"CREATE TABLE $cat.t (a BIGINT, b BIGINT)")
    sql(s"INSERT INTO $cat.t VALUES (1, 10), (2, 20)")
    // swap a and b through a temp name
    sql(s"ALTER TABLE $cat.t RENAME COLUMN a TO tmp")
    sql(s"ALTER TABLE $cat.t RENAME COLUMN b TO a")
    sql(s"ALTER TABLE $cat.t RENAME COLUMN tmp TO b")
    assert(spark.table(s"$cat.t").columns.toSeq === Seq("b", "a"))
    val rows = sql(s"SELECT a, b FROM $cat.t ORDER BY b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((10L, 1L), (20L, 2L)),
      s"swapped columns read each other's bytes exactly: $rows")
    sql(s"INSERT INTO $cat.t VALUES (3, 30)") // a=3? order is (b, a)
    assert(sql(s"SELECT sum(a), sum(b) FROM $cat.t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).head === ((60L, 6L)))
  }

  test("DROP COLUMN: metadata-only; re-ADD cannot resurrect old bytes") {
    val (cat, w) = freshCat("dr")
    sql(s"CREATE TABLE $cat.t (id BIGINT, secret STRING, keep STRING)")
    sql(s"INSERT INTO $cat.t VALUES (1,'s1','k1'),(2,'s2','k2')")
    val preFiles = TxTable.snapshotState(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t")).files.toSet
    sql(s"ALTER TABLE $cat.t DROP COLUMN secret")
    assert(TxTable.snapshotState(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t")).files.toSet === preFiles,
      "drop moved zero bytes")
    assert(spark.table(s"$cat.t").columns.toSeq === Seq("id", "keep"))
    // time travel still reads the dropped column
    assert(sql(s"SELECT secret FROM $cat.t VERSION AS OF 2 ORDER BY id")
      .collect().map(_.getString(0)).toSeq === Seq("s1", "s2"))
    // re-adding the name maps to a FRESH physical: all nulls, never s1/s2
    sql(s"ALTER TABLE $cat.t ADD COLUMN secret STRING")
    val vals = sql(s"SELECT secret FROM $cat.t").collect().map(_.isNullAt(0))
    assert(vals.forall(identity),
      "the re-added column null-fills; the dropped bytes never resurrect")
    sql(s"INSERT INTO $cat.t VALUES (3, 'k3', 'fresh')")
    assert(sql(s"SELECT secret FROM $cat.t WHERE id = 3").collect()
      .head.getString(0) === "fresh")
    assert(sql(s"SELECT count(secret) FROM $cat.t").collect()
      .head.getLong(0) === 1L)
    // DROP COLUMN IF EXISTS on a missing column is a no-op
    sql(s"ALTER TABLE $cat.t DROP COLUMN IF EXISTS never_was")
    intercept[Exception](sql(s"ALTER TABLE $cat.t DROP COLUMN never_was"))
  }

  test("DML over a renamed column — copy-on-write route") {
    val (cat, _) = freshCat("dmlc")
    sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)")
    sql(s"INSERT INTO $cat.t SELECT id, concat('v', id) FROM range(100)")
    sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
    sql(s"UPDATE $cat.t SET label = 'hit' WHERE id = 7")
    sql(s"DELETE FROM $cat.t WHERE id = 9")
    sql(s"MERGE INTO $cat.t USING (SELECT 7 AS id, 'merged' AS label " +
      s"UNION ALL SELECT 200, 'new') s ON $cat.t.id = s.id " +
      "WHEN MATCHED THEN UPDATE SET label = s.label " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(sql(s"SELECT label FROM $cat.t WHERE id = 7").collect()
      .head.getString(0) === "merged")
    assert(sql(s"SELECT count(*) FROM $cat.t WHERE id = 9").collect()
      .head.getLong(0) === 0L)
    assert(sql(s"SELECT label FROM $cat.t WHERE id = 200").collect()
      .head.getString(0) === "new")
    assert(sql(s"SELECT count(*) FROM $cat.t").collect()
      .head.getLong(0) === 100L)
  }

  test("DML over a renamed column — dv_dml (merge-on-read) route") {
    val w = java.nio.file.Files.createTempDirectory("txmapdv").toString
    spark.conf.set("spark.sql.catalog.gmdv", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gmdv.warehouse", w)
    spark.conf.set("spark.sql.catalog.gmdv.dv_dml", "true")
    sql("CREATE TABLE gmdv.t (id BIGINT, v STRING)")
    sql("INSERT INTO gmdv.t SELECT id, concat('v', id) FROM range(100)")
    sql("ALTER TABLE gmdv.t RENAME COLUMN v TO label")
    sql("UPDATE gmdv.t SET label = 'hit' WHERE id = 7")
    val c = TxTable.history(spark, s"$w/t").last
    assert(c.action === "dv", s"the delta route still plans: ${c.action}")
    sql("DELETE FROM gmdv.t WHERE id = 9")
    assert(sql("SELECT label FROM gmdv.t WHERE id = 7").collect()
      .head.getString(0) === "hit")
    assert(sql("SELECT count(*) FROM gmdv.t").collect()
      .head.getLong(0) === 99L)
    // the DV + mapped scan stays exact under a selective predicate
    assert(sql("SELECT id FROM gmdv.t WHERE id BETWEEN 5 AND 12 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq ===
      Seq(5L, 6L, 7L, 8L, 10L, 11L, 12L))
  }

  test("data skipping survives a rename: stats keyed physical, pruned logical") {
    val (cat, w) = freshCat("sk")
    TxTable.overwriteClustered(spark, s"$w/t",
      spark.range(10000).selectExpr("id", "concat('v', id) AS v"),
      "id", numFiles = 8)
    sql(s"ALTER TABLE $cat.t RENAME COLUMN id TO key")
    // programmatic range read under the NEW logical name
    val got = TxTable.readRange(spark, s"$w/t", "key", 100, 110)
    assert(got.count() === 11L)
    // SQL selective read: file pruning from the log + pushed filters
    val df = sql(s"SELECT key FROM $cat.t WHERE key = 5000")
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(5000L))
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .find(_.nodeName.toLowerCase.contains("batchscan"))
      .getOrElse(fail("no BatchScan leaf"))
    val out = scan.metrics("numOutputRows").value
    assert(out < 10000 / 4,
      s"file + row-group pruning held through the rename (scan emitted $out)")
    // appendClustered keeps indexing under the mapping
    TxTable.appendClustered(spark, s"$w/t",
      spark.range(10000, 12000).selectExpr("id AS key", "concat('v', id) AS v"))
    assert(TxTable.readRange(spark, s"$w/t", "key", 10500, 10510).count() === 11L)
  }

  test("z-order and bloom indexes survive renames of their columns") {
    val (_, w) = freshCat("zb")
    val p = s"$w/t"
    // z-ordered table: rename BOTH dimensions, then probe by new names
    TxTable.overwriteZordered(spark, p,
      spark.range(20000).selectExpr("id AS a", "(id * 7) % 20000 AS b",
        "concat('v', id) AS v"), "a", "b", numFiles = 8)
    TxTable.renameColumn(spark, p, "a", "x")
    TxTable.renameColumn(spark, p, "b", "y")
    val box = TxTable.readBox(spark, p, Seq(("x", 100L, 200L), ("y", 0L, 19999L)))
    assert(box.count() === 101L, "the box probe reads through both renames")
    assert(box.inputFiles.length < 8,
      s"the z-rectangles still prune (${box.inputFiles.length}/8 kept)")
    val e = intercept[Exception](
      TxTable.readBox(spark, p, Seq(("a", 0L, 10L))))
    assert(e.getMessage.contains("no column 'a'"),
      s"the stale pre-rename name fails loudly at the surface, not at " +
        s"action time through the physical fallback: ${e.getMessage}")
    // bloom-indexed table: rename the bloom column, point-probe by new name
    val pb = s"$w/b"
    TxTable.overwriteClustered(spark, pb,
      spark.range(20000).selectExpr("id", "(id * 31) % 100000 AS code"),
      "id", numFiles = 8, bloomCol = Some("code"))
    TxTable.renameColumn(spark, pb, "code", "token")
    val pts = TxTable.readPoints(spark, pb, "token", Seq(31L, 62L))
    assert(pts.collect().map(_.getLong(1)).sorted.toSeq === Seq(31L, 62L),
      "the bloom probe reads through the rename")
  }

  test("evolveAppend widens a RENAMED table without disturbing the map") {
    val (_, w) = freshCat("ew")
    val p = s"$w/t"
    TxTable.overwrite(spark, p, Seq((1L, "a")).toDF("id", "v"))
    TxTable.renameColumn(spark, p, "v", "label")
    // widen with a new column while carrying the renamed one
    TxTable.evolveAppend(spark, p,
      Seq((2L, "b", 9L)).toDF("id", "label", "extra"))
    val rows = TxTable.read(spark, p).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")),
      "the renamed column reads across pre- and post-evolution files")
    assert(rows(0).isNullAt(2) && rows(1).getLong(2) === 9L)
    // the mapping survived the widening commit
    assert(TxTable.isMapped(TxTable.snapshotState(spark, p,
      TxTable.latestVersion(spark, p))))
  }

  test("CDF and maintenance compose with the mapping") {
    val (cat, w) = freshCat("cdf")
    sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)")
    sql(s"INSERT INTO $cat.t VALUES (1,'a'),(2,'b')")
    sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
    sql(s"INSERT INTO $cat.t VALUES (3,'c')")
    val head = TxTable.latestVersion(spark, s"$w/t")
    // post-rename window serves inserts under the new logical name
    val feed = TxTable.changesRows(spark, s"$w/t", head - 1, head)
    assert(feed.columns.contains("label") && !feed.columns.contains("v"))
    assert(feed.select("label").collect().map(_.getString(0)).toSeq ===
      Seq("c"))
    // compactSmall carries the mapping (files merge, names still map)
    TxTable.compactSmall(spark, s"$w/t", minFileBytes = Long.MaxValue)
    assert(sql(s"SELECT label FROM $cat.t ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    assert(TxTable.isMapped(TxTable.snapshotState(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t"))),
      "a partial rewrite carries the mapping forward")
    // optimize rewrites EVERYTHING: the mapping purges, plan returns native
    TxTable.optimize(spark, s"$w/t", Seq("id"), numFiles = 1)
    assert(!TxTable.isMapped(TxTable.snapshotState(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t"))),
      "a full rewrite purges the mapping")
    assert(sql(s"SELECT label FROM $cat.t ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    val plan = sql(s"SELECT label FROM $cat.t").queryExecution
      .executedPlan.toString
    assert(!plan.contains("TxFileScan"),
      s"the purged table plans the native parquet scan again:\n$plan")
  }

  test("V1 format(txtable) route reads a mapped snapshot") {
    val (cat, w) = freshCat("v1")
    sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)")
    sql(s"INSERT INTO $cat.t VALUES (1,'a'),(2,'b')")
    sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
    val df = spark.read.format("txtable").load(s"$w/t")
    assert(df.columns.toSeq === Seq("id", "label"))
    assert(df.orderBy("id").collect().map(_.getString(1)).toSeq ===
      Seq("a", "b"))
    assert(df.filter(col("label") === "a").count() === 1L)
  }

  test("CTAS from a mapped table starts a FRESH identity mapping") {
    val (cat, w) = freshCat("ct")
    sql(s"CREATE TABLE $cat.src (id BIGINT, v STRING)")
    sql(s"INSERT INTO $cat.src VALUES (1,'a')")
    sql(s"ALTER TABLE $cat.src RENAME COLUMN v TO label")
    sql(s"CREATE TABLE $cat.dst AS SELECT * FROM $cat.src")
    val dst = TxTable.snapshotState(spark, s"$w/dst",
      TxTable.latestVersion(spark, s"$w/dst"))
    assert(!TxTable.isMapped(dst),
      "the new table's files carry its own logical names")
    assert(sql(s"SELECT label FROM $cat.dst").collect()
      .map(_.getString(0)).toSeq === Seq("a"))
  }

  test("copy-on-write DML keeps the clustered LAYOUT through a rename") {
    // the rewrite's ordered-write declaration translates the recorded
    // PHYSICAL cluster column to its logical name — without it a
    // whole-table UPDATE after a rename restages files unsorted and
    // every later range read degrades toward a full scan
    val (cat, w) = freshCat("ly")
    TxTable.overwriteClustered(spark, s"$w/t",
      spark.range(20000).selectExpr("id", "concat('v', id) AS v"),
      "id", numFiles = 8)
    sql(s"ALTER TABLE $cat.t RENAME COLUMN id TO key")
    sql(s"UPDATE $cat.t SET v = concat(v, '!') WHERE key % 2 = 0")
    val st = TxTable.snapshotState(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t"))
    val kept = TxTable.readRange(spark, s"$w/t", "key", 100, 199)
      .inputFiles.length
    assert(kept <= 2,
      s"the restaged files stayed range-clustered: a 100-key probe " +
        s"kept $kept of ${st.files.size} files (unsorted restaging " +
        "would overlap them all)")
    assert(TxTable.readRange(spark, s"$w/t", "key", 100, 199).count() === 100L)
  }

  test("_file/_pos provenance stays queryable on a mapped snapshot") {
    val (cat, _) = freshCat("pv")
    sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)")
    sql(s"INSERT INTO $cat.t VALUES (1,'a'),(2,'b'),(3,'c')")
    sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
    // the row branch reads under physical names; the projection binds
    // the LOGICAL required schema — values must line up exactly
    val rows = sql(s"SELECT id, label, _file, _pos FROM $cat.t ORDER BY id")
      .collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b", "c"),
      "the renamed column reads exactly next to the metadata columns")
    assert(rows.forall(r => r.getString(2).endsWith(".parquet")))
    assert(rows.map(_.getLong(3)).toSet.subsetOf(Set(0L, 1L, 2L)))
  }

  test("the retired set survives history expiry (checkpoint carries props)") {
    val (cat, w) = freshCat("re")
    sql(s"CREATE TABLE $cat.t (id BIGINT, x STRING)")
    sql(s"INSERT INTO $cat.t VALUES (1,'dead')")
    sql(s"ALTER TABLE $cat.t DROP COLUMN x")
    // push the DROP commit below the retention cutoff
    (0 until 4).foreach(i => sql(s"INSERT INTO $cat.t VALUES (${10 + i})"))
    TxTable.expireHistory(spark, s"$w/t", keepVersions = 2)
    val props = TxTable.properties(spark, s"$w/t",
      TxTable.latestVersion(spark, s"$w/t"))
    assert(graft.api.TxMapping.retired(props).contains("x"),
      s"the resurrection guard survived the expiry: $props")
    // and a re-ADD still maps fresh: the dropped value stays dead
    sql(s"ALTER TABLE $cat.t ADD COLUMN x STRING")
    assert(sql(s"SELECT x FROM $cat.t WHERE id = 1").collect()
      .head.isNullAt(0), "'dead' never resurrects, even after expiry")
  }

  test("readStream.table survives a mid-stream RENAME (metadata-only)") {
    // the evolution gate compares PHYSICAL names: a rename changes no
    // file's columns, so the live stream must keep flowing (projected
    // under its load-time logical names) instead of failing for a
    // spurious "schema evolved" — only a genuine widening restarts it
    val (cat, _) = freshCat("ms")
    sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)")
    sql(s"INSERT INTO $cat.t VALUES (1,'a'),(2,'b')")
    val ck = java.nio.file.Files.createTempDirectory("txmapck").toString
    val q = spark.readStream.table(s"$cat.t")
      .writeStream.format("memory").queryName("txmap_stream")
      .option("checkpointLocation", ck).start()
    try {
      q.processAllAvailable()
      assert(spark.table("txmap_stream").count() === 2L)
      sql(s"ALTER TABLE $cat.t RENAME COLUMN v TO label")
      sql(s"INSERT INTO $cat.t VALUES (3,'c')")
      q.processAllAvailable() // must NOT trip the evolution gate
      assert(spark.table("txmap_stream").orderBy("id").collect()
        .map(_.getString(1)).toSeq === Seq("a", "b", "c"),
        "post-rename appends flow under the load-time projection")
      // a genuine widening still restarts the stream loudly
      sql(s"ALTER TABLE $cat.t ADD COLUMN extra BIGINT")
      sql(s"INSERT INTO $cat.t VALUES (4,'d',40)")
      val e = intercept[Exception](q.processAllAvailable())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("evolved")),
        s"the widening fails the stream, naming the restart: ${msgs(e)}")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS txmap_stream")
      ()
    }
  }

  test("programmatic evolveAppend under a retired name picks fresh physicals") {
    val (_, w) = freshCat("ev")
    val p = s"$w/t"
    TxTable.overwrite(spark, p, Seq((1L, "x1")).toDF("id", "x"))
    TxTable.dropColumn(spark, p, "x")
    // re-introduce 'x' through evolveAppend: new physical, no resurrection
    TxTable.evolveAppend(spark, p, Seq((2L, "fresh")).toDF("id", "x"))
    val rows = TxTable.read(spark, p).orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows(0).isNullAt(1), "row 1's dropped 'x1' stays dead")
    assert(rows(1).getString(1) === "fresh")
  }
}
