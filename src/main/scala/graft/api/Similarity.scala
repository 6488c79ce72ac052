package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public similarity-search API over an embedding column
  * (array<float|double>). Brute-force is the exact baseline (one linear
  * scan per query batch, broadcast queries); IVF is the probed scale
  * path. All cosine math runs through the codegen'd native expression.
  */
object Similarity {

  private def prepared(vectors: DataFrame, idCol: String, vecCol: String) = {
    graft.functions.VectorFunctions.register(vectors.sparkSession)
    vectors.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
  }

  /** Exact top-k neighbors for one stored vector id. */
  def topK(vectors: DataFrame, idCol: String, vecCol: String,
           queryId: Long, k: Int): DataFrame = {
    val e = prepared(vectors, idCol, vecCol)
    val q = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", expr("cosine_sim(v, qv)"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** Exact batch kNN join: top-k corpus neighbors for every query row.
    * Queries are broadcast; the corpus streams once.
    */
  def knnJoin(vectors: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame = {
    val e = prepared(vectors, idCol, vecCol)
    val q = prepared(queries, idCol, vecCol)
      .withColumnRenamed("vec_id", "qid").withColumnRenamed("v", "qv")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(v, qv)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** IVF-style approximate top-k: assign vectors to their nearest
    * centroid, probe the query's nProbe nearest centroid partitions,
    * exact search within. Centroids come from the caller (k-means or any
    * deterministic pick); with a partitioned/bucketed corpus the probe
    * prunes ~ (1 - nProbe/nCentroids) of all IO.
    */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, idCol: String,
              vecCol: String, queryId: Long, k: Int, nProbe: Int): DataFrame = {
    val e = prepared(vectors, idCol, vecCol)
    val cents = prepared(centroids, idCol, vecCol)
      .withColumnRenamed("vec_id", "cent_id").withColumnRenamed("v", "cv")
    val wAssign = Window.partitionBy("vec_id").orderBy(col("cd").desc, col("cent_id"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("cd", expr("vec_dot(v, cv)"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cent_id"))
    val qv = e.filter(col("vec_id") === queryId).select(col("v").as("qv"))
    val probes = cents.crossJoin(broadcast(qv))
      .withColumn("cd", expr("vec_dot(qv, cv)"))
      .orderBy(col("cd").desc, col("cent_id"))
      .limit(nProbe)
      .select(col("cent_id"))
    assigned.join(broadcast(probes), "cent_id")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qv))
      .withColumn("cos", expr("cosine_sim(v, qv)"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("cent_id"), round(col("cos"), 4).as("cos"))
  }
}
