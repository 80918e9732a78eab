package graft.operators

import graft.SparkSpec

/** Co-located joins via write-time bucketing: both sides bucketed by the
  * join key ⇒ the sort-merge join runs with no Exchange on either side. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  "writeBucketed" should "join two co-bucketed tables without any shuffle" in {
    // the in-memory catalog forgets tables between JVMs but their managed
    // locations survive on disk — clear both before writing
    Seq("b_orders", "b_customers").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), tbl)
      if (java.nio.file.Files.exists(loc)) {
        java.nio.file.Files.walk(loc)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    val orders = (1L to 1000L).map(i => (i, i % 7, s"o$i")).toDF("o_id", "cust", "tag")
    val customers = (0L to 6L).map(i => (i, s"c$i")).toDF("cust", "name")

    Joins.writeBucketed(orders, "b_orders", "cust", 4)
    Joins.writeBucketed(customers, "b_customers", "cust", 4)
    // disable broadcast so the co-location (not a broadcast) removes the
    // exchanges; AQE off for a stable plan string
    withSql("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customers"), "cust")
      val plan = joined.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      plan should not include "Exchange"
      joined.count() shouldBe 1000
    }
  }

  private def withSql[T](settings: (String, String)*)(f: => T): T = {
    val old = settings.map { case (k, _) => k -> spark.conf.getOption(k) }
    settings.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
