package graft

import org.apache.spark.sql.SparkSession

/** Bench main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failing query is reported in `errors` with a
  * negative timing — never silently folded into the total (a broken query
  * must not look like a fast query). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String =
      s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case c if c < ' ' => " "
        case c            => c.toString
      }

    // warm the session (codegen, file listing, shuffle machinery) so the
    // alphabetically-first query doesn't absorb ~4s of one-time JVM cost
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-sink write, NOT count(): above a count Catalyst prunes every
      // unreferenced projection (a per-row text query would be timed as a
      // bare parquet scan). The noop sink consumes full rows, so the timing
      // covers the whole projected computation while writing nothing.
      val outcome =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      // drop intermediates persisted inside operators (minhash sigs,
      // simhash tables): queries sharing an identical sub-plan would
      // otherwise reuse (or re-register — "already cached" warnings) the
      // previous query's blocks, contaminating both timings and memory
      spark.catalog.clearCache()
      (name, (System.nanoTime() - t0) / 1e9, outcome)
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = results
      .map { case (k, v, err) => s""""${esc(k)}":${if (err.isEmpty) v else -1}""" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      s""""${esc(k)}":"${esc(m.take(300))}""""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""errors":$errs,"nOk":${ok.size},"nFailed":${results.size - ok.size},""" +
        s""""sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
