package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Flagship-pipeline linearity stress: the composed near-dup removal
  * pipeline (minhash/LSH pairs → connected components → keep-best →
  * apply) timed PER STAGE at two tiers a 10× apart (default 200k and
  * 2M docs), so super-linear constants the per-op stress points hide
  * show up as a stage ratio ≫ 10.
  *
  * The corpus has CONTROLLED duplicate structure: documents come in
  * 5-member families (family = doc_id / 5) sharing 50 tokens except one
  * member-salted position, so the candidate-pair count is ~10 pairs per
  * family — linear in n BY CONSTRUCTION. That isolates what this stress
  * measures (operator scaling) from what the uniform-random corpus of
  * [[StressScale]] measures (bucket-collision growth, a data property).
  * Components are 5-cliques, so CC converges in O(1) rounds at any n.
  *
  * `sbt "runMain graft.tools.StressPipeline 200000 2000000"` prints one
  * JSON line: per-tier {stage: {sec, rows}} plus per-stage 2M/200k
  * ratios (ideal ≈ the tier ratio; the driver-visible linearity record).
  */
object StressPipeline {

  def main(args: Array[String]): Unit = {
    val tiers =
      if (args.nonEmpty) args.toSeq.map(_.toLong) else Seq(200000L, 2000000L)
    val spark = Tables.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")

    // 5-doc near-dup families: token i of doc d is a HASH-DERIVED word
    // ("w" + hash(d/5, i) mod 10^6) — NOT a small fixed vocabulary. The
    // operator shingles CHARACTERS, so a 30-word vocab would make every
    // document's 5-gram set overlap every other's (the uniform
    // StressScale corpus measures exactly that bucket-collision regime);
    // hash words keep cross-family Jaccard ≈ 0 and the pair count pinned
    // to the planted families. Position (d%5)*9 is salted by the member
    // index, so siblings differ pairwise in 2 of 50 tokens (char-shingle
    // Jaccard ≈ 0.75, above the 4-band LSH threshold).
    def mkDocs(n: Long): DataFrame = {
      // integer division (Column./ is DOUBLE division — floor+cast pins
      // the family key to a long)
      val fam = floor(col("id") / lit(5)).cast("long")
      val member = (col("id") % 5L).cast("int")
      spark.range(n).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 50).map { i =>
          val base = concat(lit("w"),
            pmod(xxhash64(fam, lit(i)), lit(1000000L)).cast("string"))
          if (i % 9 == 0)
            when(member === lit(i / 9),
              concat(base, lit("_"), member.cast("string"))).otherwise(base)
          else base
        }: _*).as("text"),
        (col("id") % 20).cast("string").as("source"),
        // keep-best quality signal: deterministic per doc, distinct
        // within a family so the argmax is unique
        pmod(xxhash64(col("id"), lit(42)), lit(1000000L)).as("quality"))
    }

    def stage(label: String)(f: => (DataFrame, Long)): (String, Double, Long, DataFrame) = {
      val t0 = System.nanoTime()
      val (df, rows) = f
      (label, (System.nanoTime() - t0) / 1e9, rows, df)
    }

    val perTier = tiers.map { n =>
      // shuffle partitions sized to the tier (the knob a 100 TB run sets
      // cluster-wide): ~16k docs per reduce partition keeps the shingle
      // explode's per-task hash aggregates within executor memory; AQE
      // coalesces the small tiers back down
      spark.conf.set("spark.sql.shuffle.partitions",
        math.max(32L, n / 16000L).toString)
      val docs = mkDocs(n).persist()
      docs.count() // corpus materialization outside the timers

      // stage 1: signatures + banded pairs, materialized (localCheckpoint
      // forces the frame AND hands the next stage a lineage-free input, so
      // each stage's timer covers exactly its own work)
      val s1 = stage("pairs") {
        val p = Dedup
          .minhashLsh(docs, shingleN = 5, k = 16, bands = 4, tier = Dedup.FastXx)
          .select("id_a", "id_b").localCheckpoint()
        (p, p.count())
      }
      val s2 = stage("cc") {
        val c = Dedup.connectedComponents(s1._4).localCheckpoint()
        (c, c.count())
      }
      val s3 = stage("keep_best") {
        val kept = Dedup.applyClustersKeepBest(docs, s2._4, col("quality"))
        kept.write.format("noop").mode("overwrite").save()
        (kept, kept.count())
      }
      val s4 = stage("apply") {
        val kept = Dedup.applyClusters(docs, s2._4)
        kept.write.format("noop").mode("overwrite").save()
        (kept, kept.count())
      }
      val stages = Seq(s1, s2, s3, s4)
      docs.unpersist()
      s1._4.unpersist()
      s2._4.unpersist()
      n -> stages
    }

    val tierJson = perTier.map { case (n, stages) =>
      val ss = stages.map { case (l, sec, rows, _) =>
        f""""$l":{"sec":$sec%.2f,"rows":$rows}"""
      }.mkString(",")
      f"""{"nDocs":$n,"total_sec":${stages.map(_._2).sum}%.2f,"stages":{$ss}}"""
    }.mkString("[", ",", "]")
    val ratios =
      if (perTier.size == 2) {
        val (nA, a) = perTier.head
        val (nB, b) = perTier.last
        val r = a.zip(b).map { case ((l, sA, _, _), (_, sB, _, _)) =>
          f""""$l":${sB / math.max(sA, 0.01)}%.1f"""
        }.mkString(",")
        f""","tier_ratio":${nB.toDouble / nA}%.1f,"sec_ratios":{$r}"""
      } else ""
    println(s"""{"pipeline":"minhash->cc->keep_best->apply","tiers":$tierJson$ratios}""")
    spark.stop()
  }
}
