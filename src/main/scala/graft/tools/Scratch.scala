package graft.tools

import graft.{SparkEntry, Tables}

/** Throwaway timing/plan harness for iterating on single queries:
  * `sbt "runMain graft.tools.Scratch <sfDir> <query> [query...]"` —
  * times each query with a noop-sink write (cold cache) and prints
  * whether the executed adaptive plan reused exchanges. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.session(s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // warm
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s)
          .getOrElse(-1L)
        stageLog.add((si.stageId, si.numTasks, ms,
          si.rddInfos.sortBy(_.id).map(_.name).mkString(">").take(90)))
      }
    })
    val verbose = sys.env.contains("SPARK_GRAFT_STAGES")
    names.foreach { name =>
      stageLog.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val st = stageLog.asScala.toSeq
      println(f"SCRATCH $name%-28s $sec%8.2f s  stages=${st.size}  tasks=${st.map(_._2).sum}")
      if (verbose) st.sortBy(-_._3).take(8).foreach { case (id, n, ms, nm) =>
        println(f"  stage $id%4d  $ms%6d ms  $n%4d tasks  $nm")
      }
      if (sys.env.contains("SPARK_GRAFT_PLAN")) {
        val df2 = SparkEntry.queries(name)(spark, sfDir)
        df2.write.format("noop").mode("overwrite").save()
        println(df2.queryExecution.executedPlan.toString.take(8000))
      }
    }
    spark.stop()
  }
}
