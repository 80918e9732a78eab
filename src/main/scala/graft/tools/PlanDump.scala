package graft.tools

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, Tables}

/** Dump `.explain("formatted")` for SELECTED queries to files — the
  * plans/r17/<query>_{before,after}.txt evidence the optimization rounds
  * commit per touched query.
  *
  * `sbt "runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]"`
  * writes `<outDir>/<query>_<suffix>.txt` per query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = args.drop(3).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session("local[4]", shufflePartitions = 4)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      val inner = SparkEntry.innerPlans.get(name).map { fn =>
        "\n=== per-round inner plan ===\n\n" + fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
      }.getOrElse("")
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan + inner)
      Tables.dropPersisted(spark)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
