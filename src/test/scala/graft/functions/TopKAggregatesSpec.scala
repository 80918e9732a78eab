package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKFunctions

import graft.SparkSpec

/** Direct property tests of the native bounded aggregates — the laws the
  * operators built on them (per-group sampling, bounded EWMA) rely on:
  * the result is a pure function of the input MULTISET (partitioning-
  * invariant: heap-select is order-blind, partial/merge/final must agree
  * with a driver-side sort), and buffers round-trip serialization under
  * shuffles of any shape. */
class TopKAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(41)

  "TopKByKeyAgg" should "equal a driver-side sort-take for any k and any partitioning" in {
    // duplicate keys included: ties must break by payload, exactly like
    // the (key, payload) tuple sort
    val rows = (0 until 3000).map { i =>
      (s"g${i % 7}", rnd.nextLong() % 50, i.toLong)
    }
    val expected = rows.groupBy(_._1).view.mapValues { g =>
      g.map(t => (t._2, t._3)).sorted.take(9).map(_._2)
    }.toMap
    for (parts <- Seq(1, 3, 32)) {
      val got = rows.toDF("g", "key", "payload")
        .repartition(parts)
        .groupBy(col("g"))
        .agg(TopKFunctions.topKByKey(col("key"), col("payload"), 9).as("p"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      withClue(s"parts=$parts: ") { got shouldBe expected }
    }
  }

  it should "skip null keys and payloads like row_number over non-nulls" in {
    val df = Seq(
      (Some(3L), Some(30L)), (None, Some(1L)), (Some(1L), None),
      (Some(2L), Some(20L)), (Some(1L), Some(10L))
    ).toDF("key", "payload")
    df.agg(TopKFunctions.topKByKey(col("key"), col("payload"), 2))
      .collect()(0).getSeq[Long](0).toSeq shouldBe Seq(10L, 20L)
  }

  "LastKValuesAgg" should "keep exactly the k largest (ts, id) values, ascending, under any partitioning" in {
    val rows = (0 until 2000).map { i =>
      // colliding timestamps: the id tiebreak must match the tuple sort
      (rnd.nextInt(300).toLong, i.toLong, rnd.nextDouble() * 100 - 50)
    }
    val expected = rows.sortBy(t => (t._1, t._2)).takeRight(17).map(_._3)
    for (parts <- Seq(1, 4, 32)) {
      val got = rows.toDF("ts", "id", "v")
        .repartition(parts)
        .agg(TopKFunctions.lastKValues(col("ts"), col("id"), col("v"), 17))
        .collect()(0).getSeq[Double](0).toSeq
      withClue(s"parts=$parts: ") { got shouldBe expected }
    }
  }

  it should "return the whole series ascending when k exceeds the group size" in {
    val rows = Seq((5L, 1L, 1.5), (1L, 2L, -2.5), (3L, 3L, 0.0))
    rows.toDF("ts", "id", "v")
      .agg(TopKFunctions.lastKValues(col("ts"), col("id"), col("v"), 64))
      .collect()(0).getSeq[Double](0).toSeq shouldBe Seq(-2.5, 0.0, 1.5)
  }
}
