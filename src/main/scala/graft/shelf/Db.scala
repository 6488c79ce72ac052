package graft.shelf

import java.nio.file.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interactive query surface (`shelf db`): a view per table over its
  * parquet plus unique short aliases, then arbitrary Spark SQL; a bare
  * word becomes `SELECT * FROM word`.
  *
  * Reference: /root/reference/src/shelf/__init__.py:364-431. The
  * DuckDB-views + read_parquet plumbing maps to temp views + Catalyst;
  * output formatting mirrors JSON-records / CSV.
  */
object Db {

  def execute(spark: SparkSession, root: Path, tablePaths: Seq[String],
              query: String, names: String = "both"): DataFrame = {
    registerViews(spark, root, tablePaths, names)
    val sql =
      if (query.trim.matches("[A-Za-z_][A-Za-z0-9_]*"))
        s"SELECT * FROM ${query.trim}"
      else query
    spark.sql(sql)
  }

  /** names ∈ short | full | both (__init__.py:136-140, 381-387). */
  def registerViews(spark: SparkSession, root: Path, tablePaths: Seq[String],
                    names: String): Unit = {
    val register = (viewName: String, path: String) => {
      val parquet = Tables.tablePath(root, StepURI.table(path))
      spark.read.parquet(parquet.toString).createOrReplaceTempView(viewName)
    }
    if (names == "full" || names == "both")
      tablePaths.foreach(p => register(Naming.pathToSnake(p), p))
    if (names == "short" || names == "both")
      Naming.tableAliases(tablePaths).foreach { case (alias, tableName) =>
        tablePaths.find(p => Naming.pathToSnake(p) == tableName)
          .foreach(p => register(alias, p))
      }
  }

  def toJsonRecords(df: DataFrame): Seq[String] =
    df.toJSON.collect().toSeq

  def toCsv(df: DataFrame): String = {
    val header = df.columns.mkString(",")
    val rows = df.collect().map(_.toSeq.map {
      case null => ""
      case s: String if s.contains(",") || s.contains("\"") =>
        "\"" + s.replace("\"", "\"\"") + "\""
      case v => v.toString
    }.mkString(","))
    (header +: rows).mkString("\n")
  }
}
