package graft.operators

import org.apache.spark.sql.DataFrame

/** Small-input guard for explosive fan-out stages.
  *
  * A compact input (one parquet row group ⇒ one scan task) followed by a
  * 100-1000× explode (shingling, tokenization) runs the whole hot loop on
  * ONE core: the fan-out happens inside the scan stage, and neither AQE
  * nor `maxPartitionBytes` can split a single row group. When the input
  * has materially fewer partitions than the session's parallelism,
  * round-robin repartitioning the (by definition small) pre-explode frame
  * costs a tiny shuffle and unlocks every core for the expensive stage.
  *
  * At a real 100 TB scale the scan has thousands of partitions and this
  * is a structural no-op — but the same pathology recurs there whenever a
  * heavily-filtered or compacted input collapses to a handful of
  * partitions and then fans out, so the guard is not a test-only hack.
  */
private[graft] object Fan {

  /** Decide from logical-plan statistics, not from a materialized RDD.
    *
    * The previous probe (`df.rdd.getNumPartitions`) forced a full
    * physical plan + RDD DAG per spread site just to count partitions.
    * Catalyst's leaf statistics already know the scan size (file sources
    * report listed bytes; local relations report row bytes), and the
    * split size replicates `FilePartition.maxSplitBytes`:
    * `min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism))` —
    * Spark shrinks splits below `maxPartitionBytes` when the file set is
    * small relative to the core count, so a plain `bytes/128MB` estimate
    * would under-count partitions for mid-size scans (128 MB–4 GB at 32
    * cores) and bolt a redundant full-input shuffle onto exactly the
    * inputs where it hurts. The guard fires when the estimated partition
    * count is at most half the session parallelism, same threshold as the
    * old probe. (Conservative for heavily-filtered scans: without CBO a
    * Filter keeps its child's sizeInBytes, so a big-but-filtered input is
    * left alone — exactly the case where a repartition could be
    * expensive.)
    */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism.max(1)
    val conf = spark.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bytesPerSplit = BigInt(conf.filesMaxPartitionBytes.max(1L))
      .min(BigInt(conf.filesOpenCostInBytes.max(1L)).max(bytes / parallelism))
      .max(1)
    val estPartitions = (bytes + bytesPerSplit - 1) / bytesPerSplit
    if (estPartitions * 2 <= parallelism) df.repartition(parallelism)
    else df
  }
}
