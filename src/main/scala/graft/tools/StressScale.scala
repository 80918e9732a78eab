package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, Dedup}

/** Scale-up stress: synthesize an n-doc corpus engine-side (no driver
  * data, fully codegen'd generation) and run the heavy operators,
  * printing one JSON line of wall times. Used to sanity-check that the
  * operator plans survive 10–40× the bench scale factor —
  * `sbt "runMain graft.tools.StressScale 50000"`. */
object StressScale {

  private val words = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "join", "query", "batch",
    "window", "spark", "order", "data", "column", "small", "line",
    "customer", "filter", "the", "a", "of", "and", "index", "plan", "sort")

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = Tables.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    import spark.implicits._

    val vocab = array(words.map(lit): _*)
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 50).map(i =>
        element_at(vocab,
          (pmod(xxhash64(col("id"), lit(i)), lit(words.size)) + 1).cast("int"))): _*)
        .as("text"),
      (col("id") % 20).cast("string").as("source"))
      .persist()
    docs.count()

    def time(label: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      (label, (System.nanoTime() - t0) / 1e9, rows)
    }

    val results = Seq(
      time("dedup_exact")(Dedup.exact(docs).count()),
      time("minhash_fast")(
        Dedup.minhashLsh(docs, k = 16, bands = 4, tier = Dedup.FastXx).count()),
      time("simhash_hamming")(Dedup.simhashNearDup(docs, maxHamming = 2).count()),
      time("curate")(Curation.curate(docs).count()),
      time("clusters_fast")(
        Dedup.connectedComponents(
          Dedup.minhashLsh(docs, k = 16, bands = 4, tier = Dedup.FastXx)).count())
    )
    val qs = results.map { case (k, s, rows) =>
      f""""$k":{"sec":$s%.2f,"rows":$rows}"""
    }.mkString("{", ",", "}")
    println(s"""{"nDocs":$n,"ops":$qs}""")
    spark.stop()
  }
}
