package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** 10× stress for the COMPOSED flagship dedup pipeline (minhash-LSH
  * candidates → connected components → keep-best → apply): the per-op
  * 200k points in [[StressScale]] verify each stage is linear-ish alone,
  * but the composition can hide super-linear constants (pair blow-up
  * feeding CC, CC label tables feeding the argmax window) that only a
  * bigger corpus exposes. This synthesizes a REALISTIC dedup corpus —
  * 50k-word vocabulary, ~25% of docs planted as near-duplicate variants
  * (shared 45-word base + 5 variant words ⇒ Jaccard ≈ 0.8, inside the
  * k=16/bands=4 detection band) — and times each stage to its own
  * materialization barrier, printing one JSON line with per-stage wall
  * times, row counts, and the end-to-end total.
  *
  * `sbt "runMain graft.tools.StressPipeline 2000000"` (needs
  * `SPARK_DRIVER_MEM=24g` like the 200k StressScale suite).
  */
object StressPipeline {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = Tables.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")

    // planted near-dup groups: ids sharing `base` (0.8n bases over n ids
    // ⇒ ~25% of docs have at least one sibling) share 45 base words and
    // differ in 5 variant words seeded by id%3
    val base = pmod(col("id"), lit(n * 4 / 5))
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 45).map(i => concat(lit("w"),
          pmod(xxhash64(base, lit(i)), lit(50000)))) ++
        (45 until 50).map(i => concat(lit("v"),
          pmod(xxhash64(base, col("id") % 3, lit(i)), lit(50000)))): _*)
        .as("text"),
      (col("id") % 20).cast("string").as("source"))
      .persist()
    docs.count()

    val stages = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Long)]
    def stage(label: String)(f: => org.apache.spark.sql.DataFrame):
        org.apache.spark.sql.DataFrame = {
      val t0 = System.nanoTime()
      // eager localCheckpoint is the materialization barrier: the stage's
      // work happens HERE, not inside a downstream stage's timing
      val out = f.localCheckpoint()
      val rows = out.count()
      stages += ((label, (System.nanoTime() - t0) / 1e9, rows))
      out
    }

    val t0 = System.nanoTime()
    val pairs = stage("minhash_pairs")(
      Dedup.minhashLsh(docs, k = 16, bands = 4, tier = Dedup.FastXx)
        .select(col("id_a"), col("id_b")))
    val clusters = stage("connected_components")(
      Dedup.connectedComponents(pairs))
    val kept = stage("keep_best_apply")(
      Dedup.applyClustersKeepBest(docs, clusters, length(col("text")))
        .select(col("doc_id")))
    val total = (System.nanoTime() - t0) / 1e9

    val js = stages.map { case (k, s, rows) =>
      f""""$k":{"sec":$s%.2f,"rows":$rows}"""
    }.mkString(",")
    println(
      f"""{"nDocs":$n,"total_sec":$total%.2f,"kept":${kept.count()},"stages":{$js}}""")
    spark.stop()
  }
}
