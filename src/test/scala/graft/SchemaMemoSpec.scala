package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The footer-schema memo behind H.t / the graph reads / the
  * served-from-disk index loads (api.SchemaMemo): same schema and rows
  * as a plain inference read, and the (path, size, mtime) key must drop
  * the memo the moment the file changes — a rewritten scratch table
  * re-infers instead of reading through a stale schema.
  */
class SchemaMemoSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("memoized read equals a plain inference read (schema + rows)") {
    val plain = spark.read.parquet(s"$sfDir/documents.parquet")
    val memod = api.SchemaMemo.read(spark, s"$sfDir/documents.parquet")
    assert(memod.schema === plain.schema)
    assert(memod.count() === plain.count())
    // second call serves the memo (same key) and still reads the data
    val again = api.SchemaMemo.read(spark, s"$sfDir/documents.parquet")
    assert(again.schema === plain.schema)
    assert(again.agg(sum(length(col("text")))).collect().head.getLong(0) ===
      plain.agg(sum(length(col("text")))).collect().head.getLong(0))
  }

  test("a rewritten file re-infers: schema change is picked up") {
    val dir = java.nio.file.Files.createTempDirectory("schemamemo").toFile
    dir.deleteOnExit()
    val p = new java.io.File(dir, "t.parquet").getAbsolutePath
    spark.range(0, 5).select(col("id").as("a")).coalesce(1)
      .write.mode("overwrite").parquet(p)
    assert(api.SchemaMemo.read(spark, p).schema.fieldNames.toSeq === Seq("a"))
    // rewrite with a DIFFERENT schema; ensure the mtime actually moves
    // even on a coarse-granularity filesystem
    Thread.sleep(1100)
    spark.range(0, 7)
      .select(col("id").as("a"), (col("id") * 2).as("b")).coalesce(1)
      .write.mode("overwrite").parquet(p)
    val after = api.SchemaMemo.read(spark, p)
    assert(after.schema.fieldNames.toSeq === Seq("a", "b"))
    assert(after.count() === 7)
  }
}
