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
    spark.stop()
  }
}
