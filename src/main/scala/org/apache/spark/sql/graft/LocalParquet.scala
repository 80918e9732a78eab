package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.parquet.hadoop.metadata.CompressionCodecName

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{StructField, StructType}

/** Driver-side parquet writer for TINY, already-driver-resident frames
  * (optimization r18, guide §5 "the driver should do almost no data
  * work" — and a 1-row frame is no data work either way).
  *
  * A `Seq(...).toDF` commit — the Warehouse meta/codebook/anchor tables,
  * one to a few thousand rows that already LIVE on the driver as a
  * `LocalRelation` — still paid a full Spark write job per overwrite:
  * job scheduling, a task, the Hadoop commit protocol's temp-dir dance
  * (~0.3 s each on an otherwise idle local session, several times per
  * indexed/persisted query). This writes the same rows through the same
  * [[ParquetWriteSupport]] Spark's distributed parquet sink uses — same
  * schema conversion, same physical types, byte-compatible with a normal
  * `df.write.parquet` of that frame — with zero jobs and zero commit
  * protocol. Callers own atomicity exactly as before (the Warehouse
  * writes into a fresh version directory and swings the `_latest`
  * pointer afterwards).
  *
  * The session's own parquet write configuration (legacy format flag,
  * timestamp type, rebase modes, compression codec) is forwarded, so the
  * produced file matches what the distributed writer would have
  * produced for the same session. */
object LocalParquet {

  /** Write `rows` (InternalRows matching `output`) as ONE parquet file
    * inside `dir` (created if missing). */
  def write(
      spark: SparkSession,
      output: Seq[Attribute],
      rows: Seq[InternalRow],
      dir: java.nio.file.Path,
      fileStem: String = "part-00000"): Unit = {
    val schema = StructType(output.map(a =>
      StructField(a.name, a.dataType, a.nullable, a.metadata)))
    val sqlConf = spark.sessionState.conf
    val conf = spark.sessionState.newHadoopConf()
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    conf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key,
      sqlConf.getConf(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE).toString)
    conf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    conf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    val codec = CompressionCodecName.fromConf(
      sqlConf.parquetCompressionCodec.toUpperCase(java.util.Locale.ROOT))
    java.nio.file.Files.createDirectories(dir)
    val file = new HPath(dir.resolve(
      s"$fileStem-${codec.getExtension.stripPrefix(".")}.parquet").toString)
    val writer = new ParquetOutputFormat[InternalRow](new ParquetWriteSupport)
      .getRecordWriter(conf, file, codec)
    try rows.foreach(r => writer.write(null, r))
    finally writer.close(null)
  }
}
