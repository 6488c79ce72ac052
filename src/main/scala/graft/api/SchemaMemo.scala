package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-schema memo keyed on (path, size, mtime): every
  * `spark.read.parquet` WITHOUT a user schema re-infers the schema from
  * the footer at DataFrame construction time — pure driver-side latency,
  * paid per query per table (profiled at ~50-100 ms per read, ~20 s
  * serially across the 241-query suite, and it serializes further under
  * 16 concurrent submitters). The schema is metadata, not data: it is
  * still read from the parquet input once per (file version, JVM), and
  * the size+mtime key drops the memo the moment the file or directory
  * changes, so a rewritten scratch table re-infers. Query RESULTS are
  * never memoized — only the footer's type signature.
  */
object SchemaMemo {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, Long), StructType]()

  def read(s: SparkSession, path: String): DataFrame = {
    val f = new java.io.File(path)
    val key = (path, f.length(), f.lastModified())
    val sch = memo.computeIfAbsent(key, _ => s.read.parquet(path).schema)
    s.read.schema(sch).parquet(path)
  }
}
