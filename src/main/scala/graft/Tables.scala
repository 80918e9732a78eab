package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers for loading the driver-generated TPC-H-ish testdata tables
  * (TESTDATA.md). One parquet file per table under the sf directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spark session with scale-aware defaults; used by tests and mains.
    * Shuffle partitions sized to local cores (not the 200 default) and AQE
    * on so skewed shuffles re-plan at runtime — both matter at cluster
    * scale too, where AQE coalesces post-shuffle partitions.
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); Spark only reads those as
      // long (the values are whole microseconds, so ordering is unaffected)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // static conf, default 100 entries: a session that runs the whole
      // 78-query suite (Verify, tests, a long-lived service) spans far
      // more generated classes than that, so hot queries' classes get
      // LRU-evicted and Janino recompiles them on every re-run — worth
      // raising on any long-running Spark SQL deployment (measured in
      // Bench: suite 56 s → 39 s at sf0.1)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // the HOF→native rewrite is on wherever this library runs (the
    // extension path does the same at session build)
    org.apache.spark.sql.graft.GraftOptimizations.install(s)
    s
  }

  /** Drop cached datasets AND persisted RDD blocks. `clearCache` alone
    * leaves `localCheckpoint` blocks behind (they are persisted RDDs, not
    * catalog-cached datasets) — the ONE session-hygiene routine Bench's
    * warm-up, Bench's per-query reset, and Verify all share, so a future
    * fix (e.g. also dropping broadcast blocks) lands everywhere at once. */
  def dropPersisted(s: SparkSession): Unit = {
    s.catalog.clearCache()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
