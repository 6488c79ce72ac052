package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{TxTable, TxTableSource}

/** The DSv2 catalog contracts: identifier→path resolution, SQL DDL/DML
  * routed through the commit log, time travel, and read-plan parity
  * with the V1 native path (same log pruning, same pushed filters).
  */
class TxCatalogSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txcat").toString
    spark.conf.set("spark.sql.catalog.gx", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gx.warehouse", w)
    w
  }

  private def sql(q: String) = spark.sql(q)

  test("CREATE / INSERT INTO / SELECT round-trips through the commit log") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS gx.db")
    sql("CREATE TABLE gx.db.t1 (id BIGINT, v STRING)")
    val path = s"$warehouse/db/t1"
    assert(TxTable.latestVersion(spark, path) === 1L,
      "CREATE TABLE is commit 1 (empty, schema-carrying)")
    assert(sql("SELECT * FROM gx.db.t1").count() === 0L)

    sql("INSERT INTO gx.db.t1 VALUES (1, 'a'), (2, 'b')")
    assert(TxTable.history(spark, path).last.action === "append",
      "INSERT INTO lands as ONE transactional append commit")
    assert(sql("SELECT v FROM gx.db.t1 WHERE id = 2").collect()
      .map(_.getString(0)).toSeq === Seq("b"))

    sql("INSERT OVERWRITE gx.db.t1 VALUES (9, 'z')")
    assert(TxTable.history(spark, path).last.action === "overwrite",
      "INSERT OVERWRITE lands as ONE transactional overwrite commit")
    assert(sql("SELECT id FROM gx.db.t1").collect()
      .map(_.getLong(0)).toSeq === Seq(9L))
    // the log survived the overwrite — nothing was deleted
    assert(TxTable.readVersion(spark, path, 2).count() === 2L,
      "history below the overwrite stays readable")
  }

  test("VERSION AS OF / TIMESTAMP AS OF resolve from the log") {
    warehouse
    sql("CREATE TABLE gx.tt (id BIGINT)")
    sql("INSERT INTO gx.tt VALUES (1)")
    sql("INSERT INTO gx.tt VALUES (2)")
    assert(sql("SELECT * FROM gx.tt VERSION AS OF 2").count() === 1L)
    assert(sql("SELECT * FROM gx.tt VERSION AS OF 3").count() === 2L)
    val tsMs = TxTable.history(spark, s"$warehouse/tt")
      .find(_.version == 2L).get.ts
    val got = sql(
      s"SELECT * FROM gx.tt TIMESTAMP AS OF " +
        s"CAST(${tsMs / 1000.0} AS TIMESTAMP)").count()
    assert(got === 1L, "timestamp travel picks the last commit at/before")
    intercept[Exception](sql("SELECT * FROM gx.tt VERSION AS OF 99").collect())
  }

  test("catalog read path = native parquet scan with log pruning (V1 parity)") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS gx.plan")
    val path = s"$warehouse/plan/c"
    import spark.implicits._
    TxTable.overwriteClustered(spark, path,
      (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "v"), "id", numFiles = 8)

    val df = sql(s"SELECT v FROM gx.plan.c WHERE id BETWEEN 100 AND 120")
    assert(df.collect().length === 21)
    val kept = TxTableSource.lastScanFiles(path)
    assert(kept.nonEmpty && kept.size < 8,
      s"log metadata pruned the catalog scan (kept ${kept.size} of 8)")

    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") || plan.contains("Scan parquet"),
      s"native parquet batch scan expected:\n$plan")
    // vectorized path: the scan supports columnar batches
    assert(df.queryExecution.executedPlan.exists(
      p => p.supportsColumnar), "catalog scan reads vectorized batches")
  }

  test("pushed filters reach the parquet scan on the catalog path") {
    warehouse
    val path = s"$warehouse/pf"
    import spark.implicits._
    TxTable.overwrite(spark, path,
      (1L to 100L).map(i => (i, i % 7)).toDF("id", "k"))
    val df = sql("SELECT id FROM gx.pf WHERE id > 90")
    val scanDesc = df.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scanDesc.contains("id") && (
        scanDesc.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]") ||
        scanDesc.contains("GreaterThan(id,90)")),
      s"parquet row-group pushdown survives the catalog route:\n$scanDesc")
    assert(df.collect().map(_.getLong(0)).toSet === (91L to 100L).toSet)
  }

  test("ALTER TABLE ADD COLUMN is a data-less widening commit") {
    warehouse
    sql("CREATE TABLE gx.ev (id BIGINT)")
    sql("INSERT INTO gx.ev VALUES (1)")
    sql("ALTER TABLE gx.ev ADD COLUMN note STRING")
    val out = sql("SELECT id, note FROM gx.ev").collect()
    assert(out.map(r => (r.getLong(0), r.isNullAt(1))).toSeq ===
      Seq((1L, true)), "old files null-fill the added column")
    sql("INSERT INTO gx.ev VALUES (2, 'hello')")
    assert(sql("SELECT note FROM gx.ev WHERE id = 2").collect()
      .head.getString(0) === "hello")
    intercept[Exception](
      sql("ALTER TABLE gx.ev ADD COLUMN note BIGINT")) // type conflict
  }

  test("DDL lifecycle: list / rename / drop; namespaces are directories") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS gx.life")
    sql("CREATE TABLE gx.life.a (id BIGINT)")
    assert(sql("SHOW TABLES IN gx.life").collect()
      .map(_.getString(1)).toSet === Set("a"))
    sql("ALTER TABLE gx.life.a RENAME TO gx.life.b")
    assert(sql("SHOW TABLES IN gx.life").collect()
      .map(_.getString(1)).toSet === Set("b"))
    sql("INSERT INTO gx.life.b VALUES (5)")
    assert(sql("SELECT * FROM gx.life.b").count() === 1L)
    sql("DROP TABLE gx.life.b")
    intercept[Exception](sql("SELECT * FROM gx.life.b").collect())
  }

  test("CTAS: CREATE TABLE AS SELECT is ONE atomic staged commit") {
    warehouse
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .createOrReplaceTempView("ctas_src")
    sql("CREATE TABLE gx.ctas AS SELECT * FROM ctas_src")
    assert(sql("SELECT * FROM gx.ctas").count() === 2L)
    // the staged path: query output staged first, then published in
    // one v1 claim — no intermediate empty-table version exists
    assert(TxTable.history(spark, s"$warehouse/ctas")
      .map(_.action) === Seq("overwrite"))
    assert(TxTable.readVersion(spark, s"$warehouse/ctas", 1).count() === 2L,
      "version 1 carries the CTAS data itself")
  }

  test("path-traversal identifiers are rejected") {
    warehouse
    intercept[Exception](sql("CREATE TABLE gx.`..`.oops (id BIGINT)"))
  }
}

/** SQL DELETE / TRUNCATE through the catalog — file-level, NULL-exact. */
class TxCatalogDeleteSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txdel").toString
    spark.conf.set("spark.sql.catalog.gd", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gd.warehouse", w)
    w
  }
  private def sql(q: String) = spark.sql(q)

  test("DELETE FROM is one transactional commit with SQL NULL semantics") {
    warehouse
    sql("CREATE TABLE gd.d1 (id BIGINT, v STRING)")
    sql("INSERT INTO gd.d1 VALUES (1, 'x'), (2, 'y'), (3, NULL)")
    sql("DELETE FROM gd.d1 WHERE v = 'x'")
    val path = s"$warehouse/d1"
    assert(TxTable.history(spark, path).last.op === Some("delete"),
      "DELETE routes through deleteWhere, not a rewrite plan")
    assert(sql("SELECT id FROM gd.d1").collect().map(_.getLong(0)).toSet ===
      Set(2L, 3L), "the NULL-predicate row is KEPT (SQL DELETE semantics)")
  }

  test("DELETE on a clustered table rewrites candidate files only") {
    warehouse
    import spark.implicits._
    val path = s"$warehouse/d2"
    TxTable.overwriteClustered(spark, path,
      (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "v"), "id", numFiles = 8)
    val before = TxTable.snapshotState(spark, path,
      TxTable.latestVersion(spark, path)).files.toSet
    sql("DELETE FROM gd.d2 WHERE id BETWEEN 10 AND 20")
    val after = TxTable.snapshotState(spark, path,
      TxTable.latestVersion(spark, path)).files.toSet
    assert((before intersect after).size >= 6,
      s"most files carried by reference (${(before intersect after).size} of 8)")
    assert(sql("SELECT count(*) FROM gd.d2").collect().head.getLong(0) ===
      4000L - 11L)
  }

  test("no-match DELETE commits nothing; DELETE all + TRUNCATE stay readable") {
    warehouse
    import spark.implicits._
    val path = s"$warehouse/d3"
    // indexed table: the log metadata can PROVE a no-match delete empty
    TxTable.overwriteClustered(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id", numFiles = 1)
    val v0 = TxTable.latestVersion(spark, path)
    sql("DELETE FROM gd.d3 WHERE id > 100")
    assert(TxTable.latestVersion(spark, path) === v0,
      "a provably-empty delete is a no-op, no empty-file commit")
    sql("TRUNCATE TABLE gd.d3")
    assert(sql("SELECT * FROM gd.d3").count() === 0L)
    assert(TxTable.readVersion(spark, path, v0).count() === 2L,
      "truncate is a version, not an erasure")
  }
}

/** Conditional overwrite (replaceWhere) + ordered copy-on-write. */
class TxReplaceWhereSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txrw").toString
    spark.conf.set("spark.sql.catalog.gw", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gw.warehouse", w)
    w
  }
  private def sql(q: String) = spark.sql(q)

  test("INSERT INTO ... REPLACE WHERE swaps exactly the slice in ONE commit") {
    warehouse
    import org.apache.spark.sql.functions.col
    val path = s"$warehouse/rw1"
    TxTable.overwriteClustered(spark, path,
      (1L to 1000L).map(i => (i, s"old$i")).toDF("id", "v"), "id",
      numFiles = 4)
    val v0 = TxTable.latestVersion(spark, path)
    val before = TxTable.snapshotState(spark, path, v0).files.toSet
    (1L to 100L).map(i => (i, s"new$i")).toDF("id", "v")
      .createOrReplaceTempView("rw1_new")
    sql("INSERT INTO gw.rw1 REPLACE WHERE id <= 100 " +
      "SELECT id, v FROM rw1_new")
    assert(TxTable.latestVersion(spark, path) === v0 + 1,
      "replaceWhere is ONE commit, not delete+append")
    val after = TxTable.snapshotState(spark, path, v0 + 1).files.toSet
    assert((before intersect after).size >= 2,
      s"files outside the slice carried by reference " +
        s"(${(before intersect after).size} of 4)")
    val rows = sql("SELECT v FROM gw.rw1 WHERE id <= 100").collect()
      .map(_.getString(0))
    assert(rows.length === 100 && rows.forall(_.startsWith("new")))
    assert(sql("SELECT count(*) FROM gw.rw1").collect()
      .head.getLong(0) === 1000L)
    assert(TxTable.history(spark, path).last.op === Some("replaceWhere"))
  }

  test("DataFrameWriterV2 overwrite(condition) routes to replaceWhere") {
    warehouse
    import org.apache.spark.sql.functions.col
    sql("CREATE TABLE gw.rw2 (id BIGINT, v STRING)")
    sql("INSERT INTO gw.rw2 VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    Seq((2L, "B")).toDF("id", "v").writeTo("gw.rw2")
      .overwrite(col("id") === 2L)
    assert(sql("SELECT id, v FROM gw.rw2 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("clustered head: SQL UPDATE restages range-laid, disjoint files") {
    warehouse
    val path = s"$warehouse/rw3"
    TxTable.overwriteClustered(spark, path,
      (1L to 4000L).map(i => (i, s"v$i")).toDF("id", "v"), "id",
      numFiles = 8)
    // touch two adjacent files' ranges so the rewrite restages >= 2 files
    sql("UPDATE gw.rw3 SET v = 'X' WHERE id BETWEEN 400 AND 1100")
    val st = TxTable.snapshotState(spark, path,
      TxTable.latestVersion(spark, path))
    assert(st.files.forall(st.stats.contains), "all files keep stats")
    val ranges = st.files.map(st.stats).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi <= lo, s"restaged files stay range-disjoint: $ranges")
      case _ => ()
    }
    assert(sql("SELECT count(*) FROM gw.rw3 WHERE v = 'X'").collect()
      .head.getLong(0) === 701L)
  }
}

/** `_file` as a queryable metadata column on the regular catalog scan. */
class TxFileColumnSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("SELECT _file serves per-row file provenance with pruning intact") {
    val w = java.nio.file.Files.createTempDirectory("txfc").toString
    spark.conf.set("spark.sql.catalog.gf", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gf.warehouse", w)
    TxTable.overwriteClustered(spark, s"$w/t",
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "id", numFiles = 4)
    val out = spark.sql("SELECT id, _file FROM gf.t WHERE id <= 30").collect()
    assert(out.length === 30)
    val files = out.map(_.getString(1)).toSet
    assert(files.size <= 2 && files.forall(_.contains("/data-")),
      s"rows carry their staging file; pruning kept <= 2 of 4: $files")
    // _file never leaks into SELECT * (it is metadata, not data)
    assert(spark.sql("SELECT * FROM gf.t").schema.fieldNames.toSeq ===
      Seq("id", "v"))
  }
}

/** Indexed ingest through the catalog write path. */
class TxClusteredWriteOptionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  test("writeTo(...).option(clustered) keeps data skipping through ingest") {
    val w = java.nio.file.Files.createTempDirectory("txcw").toString
    spark.conf.set("spark.sql.catalog.gk", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gk.warehouse", w)
    val path = s"$w/t"
    TxTable.overwriteClustered(spark, path,
      (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v"), "id", numFiles = 4)
    (2000L to 2999L).map(i => (i, s"n$i")).toDF("id", "v")
      .writeTo("gk.t").option("clustered", "true").append()
    val st = TxTable.snapshotState(spark, path,
      TxTable.latestVersion(spark, path))
    assert(st.files.forall(st.stats.contains),
      "the increment landed WITH per-file range stats (indexed ingest)")
    // pruning spans base + increment
    assert(TxTable.readRange(spark, path, "id", 2100, 2200).count() === 101L)
    assert(spark.sql("SELECT count(*) FROM gk.t").collect()
      .head.getLong(0) === 2000L)
  }
}

/** The review-hardened edges: stranded locations, reserved columns,
  * unrepresentable identifiers.
  */
class TxCatalogGuardSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txgrd").toString
    spark.conf.set("spark.sql.catalog.gg", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gg.warehouse", w)
    w
  }
  private def sql(q: String) = spark.sql(q)

  test("external LOCATION is rejected loudly, not silently stranded") {
    warehouse
    val ext = java.nio.file.Files.createTempDirectory("txext").toString
    val e = intercept[Exception](
      sql(s"CREATE TABLE gg.ext (id BIGINT) LOCATION '$ext/t'"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("USING txtable LOCATION")),
      s"the error names the V1 route for external paths: ${msgs(e)}")
    assert(!sql("SHOW TABLES IN gg").collect()
      .map(_.getString(1)).contains("ext"))
  }

  test("a data column named _file is rejected at CREATE") {
    warehouse
    val e = intercept[Exception](
      sql("CREATE TABLE gg.rf (id BIGINT, _file STRING)"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("reserved")))
  }

  test("IF EXISTS statements no-op on unrepresentable identifiers") {
    warehouse
    sql("DROP TABLE IF EXISTS gg.`no such table!`") // must not throw
    assert(!spark.catalog.tableExists("gg.`weird name`"))
  }
}

/** The deep-review round: creation races, DDL edge semantics,
  * namespace/table boundaries, timestamp-travel resolution cost.
  */
class TxCatalogDeepGuardSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txdeep").toString
    spark.conf.set("spark.sql.catalog.gh", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gh.warehouse", w)
    w
  }
  private def sql(q: String) = spark.sql(q)

  test("table creation is a v1 claim: racing creators serialize") {
    warehouse
    val p = s"$warehouse/race"
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
    assert(TxTable.createExactlyV1(spark, p, df) === true)
    assert(TxTable.createExactlyV1(spark, p, df) === false,
      "the second creator loses the v1 claim and reports existence")
    assert(TxTable.latestVersion(spark, p) === 1L,
      "the loser landed NOTHING (no silent union)")
  }

  test("ADD COLUMN NOT NULL and positioned adds are rejected loudly") {
    warehouse
    sql("CREATE TABLE gh.ac (id BIGINT)")
    intercept[Exception](
      sql("ALTER TABLE gh.ac ADD COLUMN c BIGINT NOT NULL"))
    intercept[Exception](
      sql("ALTER TABLE gh.ac ADD COLUMN c BIGINT FIRST"))
    sql("ALTER TABLE gh.ac ADD COLUMN c BIGINT") // plain add still works
    assert(spark.table("gh.ac").schema.fieldNames.toSeq === Seq("id", "c"))
  }

  test("a namespace sharing the catalog's name survives RENAME TO") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS gh.gh")
    sql("CREATE TABLE gh.gh.a (id BIGINT)")
    sql("ALTER TABLE gh.gh.a RENAME TO gh.gh.b")
    assert(sql("SHOW TABLES IN gh.gh").collect()
      .map(_.getString(1)).toSet === Set("b"),
      "the real namespace wins over the catalog-prefix strip")
  }

  test("table dirs are not namespaces; empty warehouse lists empty") {
    warehouse
    sql("CREATE TABLE gh.nt (id BIGINT)")
    intercept[Exception](sql("SHOW NAMESPACES IN gh.nt"))
    intercept[Exception](sql("DROP NAMESPACE gh.nt CASCADE"))
    assert(sql("SELECT * FROM gh.nt").count() === 0L,
      "the table survived the namespace-shaped attacks")
    val w2 = java.nio.file.Files.createTempDirectory("txdeep2").toString
    spark.conf.set("spark.sql.catalog.gh2", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gh2.warehouse", s"$w2/not-yet")
    assert(sql("SHOW TABLES IN gh2").collect().isEmpty,
      "an unpopulated warehouse lists empty instead of throwing")
  }

  test("TIMESTAMP AS OF resolves by binary search (exactness pinned)") {
    warehouse
    sql("CREATE TABLE gh.bt (id BIGINT)")
    (1 to 5).foreach(i => sql(s"INSERT INTO gh.bt VALUES ($i)"))
    val hist = TxTable.history(spark, s"$warehouse/bt")
    hist.foreach { c =>
      assert(TxTable.versionAtOrBefore(spark, s"$warehouse/bt", c.ts)
        .contains(hist.filter(_.ts <= c.ts).map(_.version).max),
        s"binary search equals the dense scan at ts=${c.ts}")
    }
    assert(TxTable.versionAtOrBefore(spark, s"$warehouse/bt",
      hist.head.ts - 1000) === None)
  }
}

/** Round-18 guards: properties the log cannot persist are rejected
  * loudly; identifiers stay addressable by every statement (incl.
  * CALL's dot-split table argument); TRUNCATE cannot reach a pinned
  * snapshot.
  */
class TxCatalogPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txprop").toString
    spark.conf.set("spark.sql.catalog.gp2", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gp2.warehouse", w)
    w
  }
  private def sql(q: String) = spark.sql(q)
  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("TBLPROPERTIES / COMMENT persist in the log; foreign USING rejects") {
    warehouse
    // arbitrary values — quotes, brackets, semicolons, unicode — must
    // round-trip the hand-rolled JSON codec (base64-armored)
    sql("""CREATE TABLE gp2.p1 (id BIGINT)
           TBLPROPERTIES ('k' = 'v"w];x', 'team' = 'データ')""")
    def props(t: String): Map[String, String] =
      sql(s"SHOW TBLPROPERTIES gp2.$t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("p1").get("k") === Some("v\"w];x") &&
      props("p1").get("team") === Some("データ"),
      s"CREATE TBLPROPERTIES round-trips loadTable: ${props("p1")}")
    sql("CREATE TABLE gp2.p2 (id BIGINT) COMMENT 'a note'")
    // SHOW TBLPROPERTIES hides Spark-reserved keys (comment among
    // them) — read the persisted map straight off the log
    assert(graft.api.TxTable.properties(spark, s"$warehouse/p2", 1L)
      .get("comment") === Some("a note"))
    assert(sql("DESCRIBE TABLE EXTENDED gp2.p2").collect()
      .exists(r => r.getString(0) == "Comment" &&
        r.getString(1) == "a note"),
      "DESCRIBE surfaces the persisted comment")
    val e3 = intercept[Exception](
      sql("CREATE TABLE gp2.p3 (id BIGINT) USING parquet"))
    assert(msgs(e3).exists(_.contains("txtable tables only")),
      s"a foreign USING is rejected: ${msgs(e3)}")
    assert(sql("SHOW TABLES IN gp2").collect()
      .map(_.getString(1)).toSet === Set("p1", "p2"))
    // the catalog's own provider and a plain CREATE both pass
    sql("CREATE TABLE gp2.ok1 (id BIGINT) USING txtable")
    sql("CREATE TABLE gp2.ok2 (id BIGINT)")
    // ALTER SET/UNSET and versioned reads
    sql("ALTER TABLE gp2.p1 SET TBLPROPERTIES ('k' = 'v2', 'n' = '1')")
    assert(props("p1").get("k") === Some("v2") &&
      props("p1").get("n") === Some("1") &&
      props("p1").get("team") === Some("データ"))
    sql("ALTER TABLE gp2.p1 UNSET TBLPROPERTIES ('team')")
    assert(!props("p1").contains("team") &&
      props("p1").get("k") === Some("v2"))
    // data commits do NOT clear properties; REPLACE resets them
    sql("INSERT INTO gp2.p1 VALUES (1)")
    assert(props("p1").get("k") === Some("v2"),
      "a data commit carries properties forward")
    // time travel reads the properties as of each version
    val path = s"$warehouse/p1"
    val hist = graft.api.TxTable.history(spark, path)
    assert(graft.api.TxTable.properties(spark, path, 1L)
      .get("k") === Some("v\"w];x"), "v1 still shows the creation props")
    assert(graft.api.TxTable.properties(spark, path, hist.last.version)
      .get("k") === Some("v2"))
    sql("CREATE OR REPLACE TABLE gp2.p1 (id BIGINT) " +
      "TBLPROPERTIES ('fresh' = 'yes')")
    assert(props("p1").get("fresh") === Some("yes") &&
      !props("p1").contains("k"),
      "REPLACE defines the property map wholesale — no leakage")
  }

  test("properties survive expireHistory via the checkpoint fold") {
    warehouse
    sql("CREATE TABLE gp2.pr (id BIGINT) TBLPROPERTIES ('keep' = 'me')")
    (1 to 12).foreach(i => sql(s"INSERT INTO gp2.pr VALUES ($i)"))
    val path = s"$warehouse/pr"
    graft.api.TxTable.expireHistory(spark, path, keepVersions = 2)
    // the commit that SET the property is below the cutoff and gone —
    // only the cutoff checkpoint can carry the map forward
    intercept[Exception](graft.api.TxTable.properties(spark, path, 1L))
    assert(graft.api.TxTable.properties(spark, path,
      graft.api.TxTable.latestVersion(spark, path))
      .get("keep") === Some("me"),
      "the folded property map rode the expiry checkpoint")
    assert(sql("SHOW TBLPROPERTIES gp2.pr").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .get("keep") === Some("me"))
  }

  test("dotted identifier segments are rejected (CALL addressability)") {
    warehouse
    val e = intercept[Exception](
      sql("CREATE TABLE gp2.`a.b` (id BIGINT)"))
    assert(msgs(e).exists(_.contains("dot-free")),
      s"a dotted segment would be unaddressable via CALL: ${msgs(e)}")
  }

  test("TRUNCATE cannot reach a time-travel snapshot") {
    warehouse
    sql("CREATE TABLE gp2.tr (id BIGINT)")
    sql("INSERT INTO gp2.tr VALUES (1), (2)")
    val pinnedTable = new graft.api.TxV2Table(
      spark, s"$warehouse/tr", "gp2.tr", pinned = Some(1L))
    val e = intercept[Exception](pinnedTable.truncateTable())
    assert(e.getMessage.contains("time-travel snapshot"),
      s"the pinned guard fires before any commit: ${e.getMessage}")
    assert(sql("SELECT count(*) FROM gp2.tr").collect()
      .head.getLong(0) === 2L, "nothing was truncated")
  }
}

/** Round-20 advice hardening: the '_pos' reserved-name hole (CREATE +
  * evolution + scan-construction defense), the TBLPROPERTIES
  * lost-update race, and the no-op delta DML staging orphan.
  */
class TxCatalogAdviceR20Spec extends AnyFunSuite {
  import SparkTestSession.spark
  import graft.api.{TxTable, TxRowLevel}

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txr20").toString
    spark.conf.set("spark.sql.catalog.gr20", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gr20.warehouse", w)
    w
  }
  private def sql(q: String) = spark.sql(q)
  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("a data column named _pos is rejected at CREATE") {
    warehouse
    val e = intercept[Exception](
      sql("CREATE TABLE gr20.rp (id BIGINT, _pos BIGINT)"))
    assert(msgs(e).exists(m => m.contains("reserved") && m.contains("_pos")),
      s"CREATE with a '_pos' data column fails naming the column: ${msgs(e)}")
  }

  test("ADD COLUMN cannot re-open the reserved-name hole CREATE closes") {
    warehouse
    sql("CREATE TABLE gr20.ev (id BIGINT)")
    for (bad <- Seq("_pos BIGINT", "_file STRING", "__graft_x INT")) {
      val e = intercept[Exception](
        sql(s"ALTER TABLE gr20.ev ADD COLUMN $bad"))
      assert(msgs(e).exists(_.contains("reserved")),
        s"ALTER TABLE ADD COLUMN $bad must fail loudly: ${msgs(e)}")
    }
    assert(spark.table("gr20.ev").schema.fieldNames.toSeq === Seq("id"),
      "no reserved column landed through evolution")
  }

  test("scan construction rejects a table whose DATA schema carries _pos") {
    warehouse
    // the V1/programmatic route performs no catalog-side name check —
    // build such a table directly in the warehouse, then read it
    // through the catalog: the loud scan-construction guard must fire
    // instead of silently shadowing the user's column
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "_pos")
    TxTable.overwrite(spark, s"$warehouse/shadow", df)
    val e = intercept[Exception](sql("SELECT * FROM gr20.shadow").collect())
    assert(msgs(e).exists(m => m.contains("reserved") && m.contains("_pos")),
      s"reading a '_pos'-carrying table fails loudly: ${msgs(e)}")
  }

  test("SET TBLPROPERTIES survives a lost version race (no lost update)") {
    warehouse
    sql("CREATE TABLE gr20.pr (id BIGINT)")
    val p = s"$warehouse/pr"
    // deterministic in-process race: the FIRST merge attempt lands a
    // concurrent property commit before the outer claim, forcing a
    // lost version race; the retry must re-fold on the NEW head so
    // both properties survive
    var injected = false
    TxTable.setProperties(spark, p, cur => {
      if (!injected) {
        injected = true
        TxTable.setProperties(spark, p, c => c + ("theirs" -> "1"))
        ()
      }
      cur + ("mine" -> "2")
    })
    val props = TxTable.properties(spark, p, TxTable.latestVersion(spark, p))
    assert(props.get("theirs") === Some("1"),
      s"the racing commit's property survived the retry: $props")
    assert(props.get("mine") === Some("2"), s"our property landed too: $props")
  }

  test("a no-op delta DML statement orphans no staging directory") {
    val w = java.nio.file.Files.createTempDirectory("txr20noop").toString
    spark.conf.set("spark.sql.catalog.gr20n", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gr20n.warehouse", w)
    spark.conf.set("spark.sql.catalog.gr20n.dv_dml", "true")
    sql("CREATE TABLE gr20n.t (id BIGINT, v STRING)")
    sql("INSERT INTO gr20n.t VALUES (1,'a'),(2,'b')")
    def dataDirs = new java.io.File(s"$w/t").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("data-"))
      .map(_.getName).toSet
    val before = dataDirs
    sql("UPDATE gr20n.t SET v = 'x' WHERE id = 999") // matches nothing
    assert(dataDirs === before,
      "the nothing-matched delta commit removed its staging dir")
    assert(TxTable.history(spark, s"$w/t").last.action === "append",
      "no dv commit landed for a no-op statement")
  }

  test("requireNotReserved accepts ordinary names (incl. near-misses)") {
    for (ok <- Seq("pos", "file", "_posx", "_files", "graft_x", "x__graft_"))
      TxRowLevel.requireNotReserved(ok)
  }
}

/** Round-20: persisted table properties CONFIGURE behavior — the
  * knobs travel with the table (Delta's property model), session conf
  * stays an operational override; plus merge-on-read debt
  * observability (dv_stats, history.del_bytes).
  */
class TxPropertyBehaviorSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import graft.api.TxTable
  import org.apache.spark.sql.functions.col

  private lazy val warehouse: String = {
    val w = java.nio.file.Files.createTempDirectory("txpb").toString
    spark.conf.set("spark.sql.catalog.gpb", "graft.api.TxCatalog")
    spark.conf.set("spark.sql.catalog.gpb.warehouse", w)
    w
  }
  private def sql(q: String) = spark.sql(q)
  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("graft.dv.maxDriverBytes property arms the guard; session conf overrides") {
    warehouse
    sql("CREATE TABLE gpb.cap (id BIGINT, v STRING)")
    sql("INSERT INTO gpb.cap SELECT id, concat('v', id) FROM range(1000)")
    TxTable.deleteWhereDv(spark, s"$warehouse/cap", col("id") % 10 === 0)
    assert(sql("SELECT count(*) FROM gpb.cap").collect()
      .head.getLong(0) === 900L, "reads fine under the default cap")
    // the property alone (no session conf) trips the guard
    sql("ALTER TABLE gpb.cap SET TBLPROPERTIES ('graft.dv.maxDriverBytes' = '1')")
    val e = intercept[Exception](sql("SELECT count(*) FROM gpb.cap").collect())
    assert(msgs(e).exists(m => m.contains("compact_small") && m.contains("cap: 1")),
      s"the per-table cap fires, naming the purge verb: ${msgs(e)}")
    // session conf is the operational override over the property
    spark.conf.set("spark.graft.dv.maxDriverBytes", (64L << 20).toString)
    try assert(sql("SELECT count(*) FROM gpb.cap").collect()
      .head.getLong(0) === 900L)
    finally spark.conf.unset("spark.graft.dv.maxDriverBytes")
    // and validation rejects garbage at SET time
    val b = intercept[Exception](sql(
      "ALTER TABLE gpb.cap SET TBLPROPERTIES ('graft.dv.maxDriverBytes' = 'lots')"))
    assert(msgs(b).exists(_.contains("positive long")))
  }

  test("graft.dv_dml property flips the DML route, no catalog option needed") {
    warehouse
    sql("CREATE TABLE gpb.route (id BIGINT, v STRING)")
    sql("INSERT INTO gpb.route SELECT id, concat('v', id) FROM range(100)")
    sql("UPDATE gpb.route SET v = 'cow' WHERE id = 1")
    assert(TxTable.history(spark, s"$warehouse/route").last.action ===
      "overwrite", "the default catalog routes copy-on-write")
    sql("ALTER TABLE gpb.route SET TBLPROPERTIES ('graft.dv_dml' = 'true')")
    sql("UPDATE gpb.route SET v = 'mor' WHERE id = 2")
    val c = TxTable.history(spark, s"$warehouse/route").last
    assert(c.action === "dv" && c.dels.nonEmpty,
      s"the table property routed UPDATE merge-on-read: ${c.action}")
    sql("ALTER TABLE gpb.route UNSET TBLPROPERTIES ('graft.dv_dml')")
    sql("UPDATE gpb.route SET v = 'cow2' WHERE id = 3")
    assert(TxTable.history(spark, s"$warehouse/route").last.action ===
      "overwrite", "unsetting the property returns to the catalog default")
    assert(sql("SELECT v FROM gpb.route WHERE id IN (1,2,3) ORDER BY id")
      .collect().map(_.getString(0)).toSeq === Seq("cow", "mor", "cow2"))
  }

  test("compact_small thresholds travel as table properties") {
    warehouse
    sql("CREATE TABLE gpb.cs (id BIGINT)")
    (0 until 4).foreach(i =>
      sql(s"INSERT INTO gpb.cs SELECT id FROM range(${i * 10}, ${i * 10 + 10})"))
    val p = s"$warehouse/cs"
    val before = TxTable.snapshotState(spark, p,
      TxTable.latestVersion(spark, p)).files.size
    assert(before >= 4)
    // min = 1 byte: nothing qualifies as small -> no-op
    sql("ALTER TABLE gpb.cs SET TBLPROPERTIES " +
      "('graft.compactSmall.minFileBytes' = '1')")
    val h0 = TxTable.latestVersion(spark, p)
    sql("CALL gpb.system.compact_small(table => 'cs')")
    assert(TxTable.latestVersion(spark, p) === h0,
      "a 1-byte threshold from the property packs nothing")
    // huge min: everything packs
    sql("ALTER TABLE gpb.cs SET TBLPROPERTIES " +
      s"('graft.compactSmall.minFileBytes' = '${Long.MaxValue}')")
    sql("CALL gpb.system.compact_small(table => 'cs')")
    val after = TxTable.snapshotState(spark, p,
      TxTable.latestVersion(spark, p)).files.size
    assert(after < before,
      s"the property-driven pass packed the small files ($before -> $after)")
    assert(sql("SELECT count(*) FROM gpb.cs").collect()
      .head.getLong(0) === 40L)
  }

  test("expire_history resolves keep_versions from the table property") {
    warehouse
    sql("CREATE TABLE gpb.rt (id BIGINT)")
    (0 until 5).foreach(i => sql(s"INSERT INTO gpb.rt VALUES ($i)"))
    val p = s"$warehouse/rt"
    // without argument or property: loud, names the property
    val e = intercept[Exception](
      sql("CALL gpb.system.expire_history(table => 'rt')").collect())
    assert(msgs(e).exists(_.contains("graft.retention.keepVersions")),
      s"the error names the property: ${msgs(e)}")
    sql("ALTER TABLE gpb.rt SET TBLPROPERTIES " +
      "('graft.retention.keepVersions' = '2')")
    val expired = sql("CALL gpb.system.expire_history(table => 'rt')")
      .collect().head.getInt(0)
    assert(expired > 0, "the property-driven horizon expired history")
    assert(TxTable.history(spark, p).size === 2)
    assert(sql("SELECT count(*) FROM gpb.rt").collect()
      .head.getLong(0) === 5L, "the head still reads in full")
  }

  test("dv_stats exposes the merge-on-read backlog; purge zeroes it") {
    warehouse
    sql("CREATE TABLE gpb.dv (id BIGINT, v STRING)")
    sql("INSERT INTO gpb.dv SELECT id, concat('v', id) FROM range(1000)")
    assert(sql("CALL gpb.system.dv_stats(table => 'dv')").collect().isEmpty,
      "a DV-free table reports no debt")
    TxTable.deleteWhereDv(spark, s"$warehouse/dv", col("id") % 4 === 0)
    val rows = sql("CALL gpb.system.dv_stats(table => 'dv')").collect()
    assert(rows.nonEmpty, "the delete shows up as debt")
    rows.foreach { r =>
      assert(r.getLong(1) > 0L, "file_rows from the footer")
      assert(r.getLong(2) > 0L, "del_rows counted")
      val frac = r.getDouble(3)
      assert(frac > 0.0 && frac < 1.0, s"fraction in (0,1): $frac")
    }
    assert(rows.map(_.getLong(2)).sum === 250L,
      "recorded positions sum to the deleted row count")
    // history carries per-commit del bytes (the guard's unit)
    val hist = sql("CALL gpb.system.history(table => 'dv')").collect()
    assert(hist.last.getLong(7) > 0L,
      "the dv commit reports its delete-file bytes")
    assert(hist.head.getLong(7) === 0L, "data-only commits report zero")
    // the purge zeroes the debt
    sql("CALL gpb.system.compact_small(table => 'dv', " +
      "min_file_bytes => 1)")
    assert(sql("CALL gpb.system.dv_stats(table => 'dv')").collect().isEmpty,
      "compact_small purged the backlog")
    assert(sql("SELECT count(*) FROM gpb.dv").collect()
      .head.getLong(0) === 750L)
  }

  test("unknown and internal graft.* properties reject at SET time") {
    warehouse
    sql("CREATE TABLE gpb.val (id BIGINT)")
    val u = intercept[Exception](sql(
      "ALTER TABLE gpb.val SET TBLPROPERTIES ('graft.dv.maxDirverBytes' = '5')"))
    assert(msgs(u).exists(_.contains("unknown graft.*")),
      s"a typo'd knob fails loudly instead of silently doing nothing: ${msgs(u)}")
    val r = intercept[Exception](sql(
      "ALTER TABLE gpb.val SET TBLPROPERTIES ('graft.mapping.retired' = 'x')"))
    assert(msgs(r).exists(_.contains("DROP COLUMN")),
      s"the resurrection guard cannot be forged: ${msgs(r)}")
    val b = intercept[Exception](sql(
      "ALTER TABLE gpb.val SET TBLPROPERTIES ('graft.dv_dml' = 'maybe')"))
    assert(msgs(b).exists(_.contains("true/false")))
    // non-graft user properties remain free-form
    sql("ALTER TABLE gpb.val SET TBLPROPERTIES ('team' = 'data-eng')")
    assert(sql("SHOW TBLPROPERTIES gpb.val").collect()
      .map(r2 => r2.getString(0) -> r2.getString(1)).toMap
      .get("team") === Some("data-eng"))
  }
}
