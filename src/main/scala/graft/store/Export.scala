package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export: the last step of a data pipeline — lay the
  * curated corpus out as N deterministic shards a training job can map
  * one-to-one onto data-loader workers.
  *
  * Shard assignment is an md5 bucket of the row id (`shard =
  * bucket(seed:id) mod nShards`), NOT `rand()` or a round-robin
  * repartition: the same row lands in the same shard across retries,
  * re-runs, and engines (the arithmetic replays in SQL), which makes the
  * export auditable and resumable. Uniformity comes from md5's
  * avalanche; any id skew (sequential ids, hot ranges) is destroyed.
  */
object Export {

  /** Attach the deterministic shard id. Pure per-row projection: no
    * shuffle, pushes past column pruning like any expression. */
  def assignShards(
      df: DataFrame,
      nShards: Int,
      seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val bucket = graft.functions.HashFunctions.md5Bucket(seed, col(idCol))
    df.withColumn("shard", pmod(bucket, lit(nShards.toLong)).cast("int"))
  }

  /** Write the frame as `shard=K/` parquet directories, rows inside each
    * shard sorted by id for a reproducible layout. One shuffle
    * (repartition on the shard key) co-locates each shard's rows so a
    * shard's files are written by one task chain; `maxRecordsPerFile`
    * bounds file sizes at scale (a 100 TB export must not produce
    * per-shard monolith files). */
  def exportShards(
      df: DataFrame,
      path: String,
      nShards: Int,
      seed: Long = 42L,
      idCol: String = "doc_id",
      maxRecordsPerFile: Long = 1000000L): Unit =
    assignShards(df, nShards, seed, idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write
      .partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)

  /** JSONL (one JSON object per line) shard export — the interchange
    * format tokenizer/training toolchains actually read. Same
    * deterministic shard layout, sort, and file-size bound as
    * [[exportShards]], but gzip-compressed text: Spark's JSON sink writes
    * line-delimited records natively, and gzip'd JSONL shards are
    * splittable at the FILE level (which is why the per-file record cap
    * matters more here than for parquet — a file is the parallelism unit
    * on read). */
  def exportJsonl(
      df: DataFrame,
      path: String,
      nShards: Int,
      seed: Long = 42L,
      idCol: String = "doc_id",
      maxRecordsPerFile: Long = 1000000L,
      compression: String = "gzip"): Unit =
    assignShards(df, nShards, seed, idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write
      .partitionBy("shard")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", compression)
      .mode("overwrite")
      .json(path)

  /** Read a JSONL export back with an explicit schema — schema inference
    * over 100 TB of text is a full extra pass, so production reads always
    * supply the schema (here: taken from the caller, typically the
    * writing frame's). */
  def readJsonl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
