package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan locality: z-order (Morton)
  * clustering, the lakehouse technique (Delta OPTIMIZE ZORDER, Hudi
  * clustering) that makes min/max footer pruning effective on TWO filter
  * columns at once. Rows sorted by the bit-interleaved index land so that
  * a range predicate on either dimension touches a contiguous, small set
  * of files — at 100 TB the difference between scanning 2% and 50% of a
  * table for `WHERE user_id = ? AND hour BETWEEN ? AND ?`.
  *
  * Everything here is exact integer arithmetic (div/mod/multiply on
  * bigints — no bit intrinsics, so the same expressions replay in any
  * SQL engine), and the index is a pure row-local projection: computing
  * it costs no shuffle; only the optional re-layout write pays one range
  * repartition, which is precisely the shuffle it exists to buy.
  */
object Layout {

  /** Morton interleave of two dimensions already quantized to
    * [0, 2^bits): bit i of x lands at index position 2i+1, bit i of y at
    * 2i — an unrolled sum of 2·bits exact integer terms. */
  def morton2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xb = x.cast("bigint")
    val yb = y.cast("bigint")
    (0 until bits).map { i =>
      ((shiftright(xb, i) % 2) * lit(1L << (2 * i + 1))) +
        ((shiftright(yb, i) % 2) * lit(1L << (2 * i)))
    }.reduce(_ + _)
  }

  /** Z-order layout columns for `df`: the two quantized dims, the Morton
    * index, and an equal-width z-range bucket id (`nBuckets` must divide
    * the 2^(2·bits) z-space so the cut is exact integer division — i.e.
    * be a power of two). `xCol`/`yCol` must already be in [0, 2^bits);
    * quantize upstream (mod, epoch-hour, decile) where the caller knows
    * the distribution. */
  def zOrderLayout(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      bits: Int = 8,
      nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1 && Integer.bitCount(nBuckets) == 1,
      s"nBuckets must be a power of two: $nBuckets")
    val space = 1L << (2 * bits)
    require(nBuckets <= space, s"more buckets than z-values: $nBuckets > $space")
    val z = morton2(xCol, yCol, bits)
    val bucketShift = 2 * bits - java.lang.Long.numberOfTrailingZeros(nBuckets.toLong).toInt
    df.withColumn("zx", xCol.cast("bigint"))
      .withColumn("zy", yCol.cast("bigint"))
      .withColumn("zindex", z)
      .withColumn("bucket", shiftright(z, bucketShift))
  }

  /** Re-layout `df` so on-disk files cover contiguous, disjoint z-ranges:
    * range-repartition by the Morton index and sort within partitions —
    * after writing, every file's (zx, zy) min/max footer is tight and a
    * two-dimensional predicate prunes to the files whose z-interval it
    * intersects. This is the one deliberate shuffle in the module. */
  def zOrderWrite(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      bits: Int = 8,
      nPartitions: Int = 32): DataFrame = {
    val laid = zOrderLayout(df, xCol, yCol, bits, nBuckets = 1)
    laid.repartitionByRange(nPartitions, col("zindex"))
      .sortWithinPartitions(col("zindex"))
  }

  /** Zone-map pruning simulation — the measurement that justifies
    * [[zOrderLayout]]: lay the same rows out two ways (ARRIVAL order by
    * `seqCol` vs Z-ORDER by the Morton index), cut each into `nFiles`
    * equal-width file buckets, record every file's (zx, zy) min/max
    * footer, and count how many files a rectangular predicate
    * `zx ∈ [x0,x1] ∧ zy ∈ [y0,y1]` must scan under each layout. At
    * 100 TB this ratio IS the scan cost: a file whose footer interval
    * misses the rectangle is never opened. Arrival order correlates
    * with neither dimension, so its footers are wide and nothing
    * prunes; the z-order footers are tight on both dimensions at once.
    *
    * Everything is exact integers (Morton terms, equal-WIDTH value-range
    * file cuts — (v − min) div width with width = (max−min) div nFiles
    * + 1, from a 1-row broadcast min/max census; min/max footers;
    * interval overlap tests), so the report replays exactly in SQL, and
    * there is no global sort anywhere: each layout is a keyed agg over
    * a row-local file assignment — equal-width ranges are exactly what
    * a range-partitioned writer ([[zOrderWrite]]) produces.
    *
    * @return per layout: (layout, n_files, files_scanned, rows_scanned,
    *         rows_matching) sorted by layout */
  def zOrderPruningReport(
      df: DataFrame,
      xCol: Column,
      yCol: Column,
      seqCol: Column,
      bits: Int = 8,
      nFiles: Int = 64,
      xRange: (Long, Long) = (0L, 15L),
      yRange: (Long, Long) = (0L, 15L)): DataFrame = {
    require(nFiles >= 1, s"nFiles must be positive: $nFiles")
    val laid = zOrderLayout(df, xCol, yCol, bits, nBuckets = 1)
      .select(col("zx"), col("zy"), col("zindex"), seqCol.as("__seq"))
      .localCheckpoint() // census + both layout aggs read it
    val census = laid.agg(
      min(col("zindex")).as("__zmin"), max(col("zindex")).as("__zmax"),
      min(col("__seq")).as("__smin"), max(col("__seq")).as("__smax"))
    def layout(name: String, v: String, lo: String, hi: String) = {
      laid.crossJoin(broadcast(census))
        .withColumn("__file",
          expr(s"($v - $lo) div ((($hi - $lo) div ${nFiles}L) + 1L)"))
        .groupBy(col("__file"))
        .agg(min(col("zx")).as("xlo"), max(col("zx")).as("xhi"),
          min(col("zy")).as("ylo"), max(col("zy")).as("yhi"),
          count(lit(1)).as("n_rows"),
          sum(when(col("zx").between(xRange._1, xRange._2) &&
            col("zy").between(yRange._1, yRange._2), 1L).otherwise(0L))
            .as("n_match"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(when(col("xhi") >= xRange._1 && col("xlo") <= xRange._2 &&
            col("yhi") >= yRange._1 && col("ylo") <= yRange._2, 1L)
            .otherwise(0L)).as("files_scanned"),
          sum(when(col("xhi") >= xRange._1 && col("xlo") <= xRange._2 &&
            col("yhi") >= yRange._1 && col("ylo") <= yRange._2,
            col("n_rows")).otherwise(0L)).as("rows_scanned"),
          sum(col("n_match")).as("rows_matching"))
        .select(lit(name).as("layout"), col("n_files"),
          col("files_scanned"), col("rows_scanned"), col("rows_matching"))
    }
    layout("arrival", "__seq", "__smin", "__smax")
      .unionByName(layout("zorder", "zindex", "__zmin", "__zmax"))
      .orderBy(col("layout"))
  }

  /** Compaction / file-layout planner — the planning half of the
    * small-files problem (the census behind Delta OPTIMIZE bin-packing
    * and Iceberg's rewrite_data_files): per output partition, the byte
    * mass, row count, the file count that hits `targetBytes`, and the
    * rows-per-file write plan. The plan is a slim keyed agg (ONE
    * shuffle on the partition key, two-number partials per group); the
    * write it parameterizes — `repartition(n_files)` per partition —
    * is the expensive thing it right-sizes. At 100 TB both failure
    * modes it prevents are real: a partition written at default
    * parallelism emits 10⁵ tiny files (metadata pressure, per-file open
    * cost dominates scans), and a partition written by one task emits
    * one 2 TB file (no scan parallelism, one straggler).
    *
    * Exact integers throughout: bytes are `octet_length` sums, file
    * counts are ceil-divs via (bytes + target − 1) div target clamped
    * to [1, n_rows] (a file holds at least one row), rows_per_file is
    * the ceil-div of rows over files — every column replays exactly in
    * SQL, no IEEE anywhere.
    *
    * Reference surface: the reference writes one gridfs blob per upload
    * (`sentinel-core` `processors/RunsProcessor.scala`) and never needs
    * layout planning; this is the operation its storage model grows
    * into when the corpus outgrows one node.
    *
    * @param payload per-row byte-size column (e.g. `octet_length(text)`)
    * @return one row per partition key: (keys…, n_rows, n_bytes,
    *         n_files, rows_per_file, file_bytes) sorted by keys
    */
  def compactionPlan(
      df: DataFrame,
      partCols: Seq[String],
      payload: Column,
      targetBytes: Long): DataFrame = {
    require(partCols.nonEmpty, "at least one partition column")
    require(targetBytes >= 1L, s"targetBytes must be positive: $targetBytes")
    val keys = partCols.map(col)
    val counted = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(payload.cast("long")).as("n_bytes"))
    val files = least(col("n_rows"),
      greatest(lit(1L),
        expr(s"(n_bytes + ${targetBytes - 1}L) div ${targetBytes}L")))
    counted
      .withColumn("n_files", files)
      .withColumn("rows_per_file",
        expr("(n_rows + n_files - 1) div n_files"))
      .withColumn("file_bytes", expr("n_bytes div n_files"))
      .orderBy(keys: _*)
  }
}
