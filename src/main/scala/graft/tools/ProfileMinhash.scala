package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Stage-by-stage profiler for the minhash LSH pipeline — run with
  * `sbt "runMain graft.tools.ProfileMinhash [sfDir]"`. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    docs.cache().count()

    val norm = regexp_replace(lower(col("text")), "\\s+", " ")
    val shingled = docs
      .select(col("doc_id").as("id"), norm.as("norm"))
      .select(col("id"), col("norm"),
        explode(sequence(lit(1), greatest(length(col("norm")) - lit(4), lit(1)))).as("pos"))
      .select(col("id"), col("norm").substr(col("pos"), lit(5)).as("sh"))
    time("shingle explode + count")(println(shingled.count()))

    val hashed = shingled.select(
      col("id") +: (0 until 8).map(i =>
        md5(concat(lit(s"$i:"), col("sh"))).as(s"h$i")): _*)
    val minAggs = (0 until 8).map(i => min(col(s"h$i")).as(s"h$i"))
    val sigs = hashed.groupBy(col("id")).agg(minAggs.head, minAggs.tail: _*)
    time("signatures (explode+md5+agg)")(println(sigs.count()))

    time("full minhashLsh (md5 tier)")(
      println(Dedup.minhashLsh(docs, k = 8, bands = 4).count()))
    time("full minhashLsh (xx tier)")(
      println(Dedup.minhashLsh(docs, k = 8, bands = 4, tier = Dedup.FastXx).count()))

    // cumulative plan-prefix timings for the md5 tier: which stage of the
    // FULL pipeline owns the wall-clock?
    {
      import graft.functions.{HashFunctions => H}
      spark.catalog.clearCache()
      docs.cache().count()
      val hashedF = shingled
        .select(col("id") +: (0 until 2).map(d =>
          md5(concat(lit(s"$d:"), col("sh"))).as(s"d$d")): _*)
        .select(col("id") +: (0 until 8).map(i =>
          conv(substring(col(s"d${i / 4}"), (i % 4) * 8 + 1, 8), 16, 10)
            .cast("bigint").as(s"h$i")): _*)
      val sigsF = hashedF.groupBy(col("id"))
        .agg((0 until 8).map(i => min(col(s"h$i")).as(s"h$i")).head,
          (0 until 8).map(i => min(col(s"h$i")).as(s"h$i")).tail: _*)
        .select(col("id"), array((0 until 8).map(i => col(s"h$i")): _*).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bandedF = sigsF.select(col("id"),
        explode(H.lshBandKeys(col("sig"), 4, 2)).as("band"))
      time("md5: banded.count")(println(bandedF.count()))
      val keptF = bandedF.groupBy("band").agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") <= 1000).select("band")
      val cappedF = bandedF.join(keptF, Seq("band"))
      time("md5: capped.count")(println(cappedF.count()))
      val pairsF = cappedF.select(col("band"), col("id").as("id_a"))
        .join(cappedF.select(col("band"), col("id").as("id_b")), Seq("band"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
      time("md5: pairs.count")(println(pairsF.count()))
      val matchesF = (0 until 8)
        .map(i => when(col("sig_a").getItem(i) === col("sig_b").getItem(i), 1)
          .otherwise(0)).reduce(_ + _)
      val scoredF = pairsF
        .join(sigsF.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigsF.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(col("id_a"), col("id_b"), (matchesF.cast("double") / 8).as("est_jaccard"))
      time("md5: scored.count (cached prefix)")(println(scoredF.count()))
      spark.catalog.clearCache()
      time("md5: scored.count (cold)")(println(scoredF.count()))
    }

    // raw hot-loop costs over the shingle stream, no grouping
    {
      val twoMd5 = shingled.select(
        md5(concat(lit("0:"), col("sh"))).as("a"),
        md5(concat(lit("1:"), col("sh"))).as("b"))
      time("raw 2x md5")(twoMd5.agg(max("a"), max("b")).collect())
      val slices = shingled
        .select(col("id") +: (0 until 2).map(d =>
          md5(concat(lit(s"$d:"), col("sh"))).as(s"d$d")): _*)
        .select(col("id") +: (0 until 8).map(i =>
          conv(substring(col(s"d${i / 4}"), (i % 4) * 8 + 1, 8), 16, 10)
            .cast("bigint").as(s"h$i")): _*)
      time("raw 2x md5 + 8 conv slices")(
        slices.agg(max("h0"), max("h7")).collect())
      time("raw 2x md5 + 8 conv + minagg")(
        slices.groupBy("id").agg(min("h0"), min("h7")).count())
      val eightXx = shingled.select(
        (0 until 8).map(i => xxhash64(lit(i), col("sh")).as(s"x$i")): _*)
      time("raw 8x xxhash64")(eightXx.agg(max("x0"), max("x7")).collect())
    }

    // stage split per tier: signature+persist vs band/join/score tail
    Seq(Dedup.PortableMd5 -> "md5", Dedup.FastXx -> "xx").foreach { case (tier, label) =>
      spark.catalog.clearCache()
      def slotHash(i: Int) = tier match {
        case Dedup.PortableMd5 => md5(concat(lit(s"$i:"), col("sh")))
        case Dedup.FastXx      => xxhash64(lit(i), col("sh"))
      }
      val hashedT = shingled.select(
        col("id") +: (0 until 8).map(i => slotHash(i).as(s"h$i")): _*)
      val sigsT = hashedT.groupBy(col("id"))
        .agg((0 until 8).map(i => min(col(s"h$i")).as(s"h$i")).head,
          (0 until 8).map(i => min(col(s"h$i")).as(s"h$i")).tail: _*)
      time(s"signatures only ($label)")(println(sigsT.count()))
      time(s"signatures again, warm docs ($label)")(println(sigsT.count()))
    }
    spark.stop()
  }
}
