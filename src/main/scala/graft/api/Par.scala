package graft.api

import org.apache.spark.sql.DataFrame

/** Input-width repair for CPU-DENSE per-row transforms (gram/shingle
  * explosion, normalization+hashing, vector math): parquet byte-range
  * splits bottom out at row-group granularity, so a small
  * single-row-group corpus file arrives as 1-2 partitions no matter
  * `spark.sql.files.maxPartitionBytes` — and a transform whose CPU is
  * 100-1000x the scan cost then runs on 1-2 of N cores (profiled at
  * sf≈1: a 17 s single-core bigram profile, a 3.5 s single-task random
  * projection, a 10 s 4-task normalize+hash). [[spread]] round-robins
  * such inputs across the session's parallelism ONLY when the scan is
  * narrow; on an already-wide input — the 100 TB case, where paying a
  * corpus-wide shuffle to "spread" thousands of existing splits would
  * be the real mistake — it is a no-op. Callers must be
  * partitioning-insensitive (every oracle-checked operator here is by
  * construction; the hash compare would catch a violation).
  */
object Par {

  private[graft] def spread(df: DataFrame): DataFrame = {
    val want = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    // strict `< want`, not `< want/2`: the scan's partition COUNT
    // overstates effective parallelism for row-group-sparse files —
    // Spark byte-range-splits a 6 MB single-row-group file into 2
    // splits of which only one (the one holding the row-group
    // midpoint) reads anything, so p=2 measured as ONE busy core.
    // For the dense transforms this guards, full width is worth one
    // narrow-input shuffle whenever the scan is at all under it.
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }
}
