package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.TxTable

/** `MERGE WITH SCHEMA EVOLUTION` (the AUTOMATIC_SCHEMA_EVOLUTION
  * capability): Spark derives the source columns missing from the
  * target and lands them through alterTable(AddColumn) — the additive
  * data-less widening commit — before the merge itself. One statement,
  * two commits (evolve + merge), both routes (copy-on-write and the
  * dv_dml delta operation).
  */
class TxMergeEvolutionSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def setupCat(name: String, dvDml: Boolean): String = {
    val w = java.nio.file.Files.createTempDirectory("txmevo").toString
    spark.conf.set(s"spark.sql.catalog.$name", "graft.api.TxCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", w)
    if (dvDml) spark.conf.set(s"spark.sql.catalog.$name.dv_dml", "true")
    w
  }

  private def walk(cat: String, w: String): Unit = {
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.t VALUES (1,'a'),(2,'b')")
    val preMerge = TxTable.latestVersion(spark, s"$w/t")
    Seq((2L, "B", 9.5), (3L, "c", 1.5)).toDF("id", "v", "w")
      .createOrReplaceTempView(s"mevo_src_$cat")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.t AS t
         |USING mevo_src_$cat AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, v, w FROM $cat.t ORDER BY id")
      .collect().map(r =>
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(got === Seq((1L, "a", None), (2L, "B", Some(9.5)),
      (3L, "c", Some(1.5))),
      "evolved column lands: matched update + insert carry it, " +
        "untouched rows null-fill")
    val hist = TxTable.history(spark, s"$w/t")
    val evo = hist.find(_.version == preMerge + 1).get
    assert(evo.files.isEmpty && evo.schemaB64.nonEmpty,
      "the evolution is a data-less widening commit before the merge")
    // time travel below the evolution keeps the narrow shape
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF $preMerge")
      .columns.toSeq === Seq("id", "v"))
  }

  test("MERGE WITH SCHEMA EVOLUTION: copy-on-write route") {
    val w = setupCat("gmev1", dvDml = false)
    walk("gmev1", w)
    assert(TxTable.history(spark, s"$w/t").last.op === Some("merge"))
  }

  test("MERGE WITH SCHEMA EVOLUTION: dv_dml (delta) route") {
    val w = setupCat("gmev2", dvDml = true)
    walk("gmev2", w)
    val last = TxTable.history(spark, s"$w/t").last
    assert(last.action === "dv" && last.op === Some("merge"),
      s"the merge half stays ONE delta dv commit: ${last.action}/${last.op}")
  }

  test("plain MERGE (no clause) still ignores extra source columns") {
    val w = setupCat("gmev3", dvDml = false)
    spark.sql("CREATE TABLE gmev3.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gmev3.t VALUES (1,'a')")
    Seq((1L, "A", 7.0)).toDF("id", "v", "w")
      .createOrReplaceTempView("mevo_plain")
    spark.sql(
      """MERGE INTO gmev3.t AS t USING mevo_plain AS s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |""".stripMargin)
    assert(spark.table("gmev3.t").columns.toSeq === Seq("id", "v"),
      "no evolution without the clause")
  }
}
