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
private[operators] object Fan {
  def spread(df: DataFrame): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= parallelism) df.repartition(parallelism)
    else df
  }
}
