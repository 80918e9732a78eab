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
}
