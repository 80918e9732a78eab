package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** One-off measurement harness for the trained-IVF recall bound
  * (`vector_ivf_trained_recall`): prints measured recall@10 at
  * nprobe=2 of 8 trained cells for each sf dir given, across several
  * k-means seeds, so the pinned floor can be set with redraw margin. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = Tables.session("local[32]", shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- dirs) {
      val e = spark.read.parquet(s"$d/embeddings.parquet")
      val queries = e.filter(col("vec_id") % 29 === 0)
      val truth = Similarity.bruteForceTopK(e, queries, 10)
        .select("query_id", "neighbor_id").cache()
      val nT = truth.count()
      for (seed <- Seq(42L, 7L, 123L)) {
        val anchors = Similarity.kmeansAnchors(e, k = 8, iters = 2, seed = seed)
        val approx = Similarity.ivfTopKWith(e, queries, anchors, k = 10,
          nprobe = 2)
        val hits = truth.join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
        println(f"RECALL $d seed=$seed recall=${hits.toDouble / nT}%.3f " +
          f"($hits/$nT)")
      }
      truth.unpersist()
    }
    spark.stop()
  }
}
