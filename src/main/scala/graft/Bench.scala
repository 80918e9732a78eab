package graft

import org.apache.spark.sql.SparkSession

/** Bench main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A failing query is reported in `errors` with a
  * negative timing — never silently folded into the total (a broken query
  * must not look like a fast query).
  *
  * Measurement discipline (each closing a bias found in an earlier round):
  *  - noop sink, not count(): Catalyst prunes unreferenced projections
  *    above a count, which timed per-row queries as bare scans (r3).
  *  - per-query clearCache: operator-internal persists must not leak
  *    across queries (r3).
  *  - whole-suite JIT warm-up pass at the smallest sibling SF before any
  *    timing: generated code is value-independent, so an sf0.001 run
  *    compiles the same Janino classes the timed sf run executes. Without
  *    it the alphabetically-first heavy query of each codegen family
  *    absorbed the family's entire compile+JIT cost (r4: `dedup_apply`
  *    was billed 25.2 s for a 12 s pipeline).
  *  - SPARK_GRAFT_BENCH_REPS timed passes (default 3 since r14, was 2):
  *    per-query wall = min over passes (steady-state cost), with every
  *    pass recorded under `queries_runs` so run-to-run spread is visible
  *    and ±10% noise can't masquerade as a regression. The r13 split-JVM
  *    drift study proved isolated minima are the trustworthy per-query
  *    signal; a third rep narrows the min's variance at ~1/2 suite cost.
  *  - subset knobs are ECHOED into the JSON (`bench_only`/`bench_slice`,
  *    r14): a leftover env var can no longer ship a partial suite that
  *    looks like a full TIMINGS artifact (close_round.sh rejects a
  *    non-null echo). SLICE indexes the FULL alphabetic order as
  *    documented, independent of ONLY.
  *  - generated-class cache sized to the suite (r6): the static default
  *    `spark.sql.codegen.cache.maxEntries=100` is smaller than one pass
  *    of this suite, so every heavy query's classes were LRU-evicted
  *    between its own reps and Janino recompiled them EVERY pass — the
  *    warm-up bought nothing and "steady state" silently included a
  *    compile bill (suite 56 s → 39 s once raised).
  *  - persistent-RDD cleanup between queries (r6): clearCache drops
  *    cached datasets but not localCheckpoint blocks; the LSH/CC family's
  *    truncation frames otherwise accumulate for the whole run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // static conf, default 100: a 78-query suite spans far more
      // generated-class cache entries than that, so each heavy query's
      // classes are LRU-evicted between its own reps and Janino recompiles
      // them every pass — the in-suite-vs-isolated gap on the LSH family
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftOptimizations.install(spark)

    def esc(s: String): String =
      s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case c if c < ' ' => " "
        case c            => c.toString
      }

    // session warm-up (file listing, shuffle machinery, parquet codec)
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // JIT warm-up: run the whole suite once at the smallest sibling SF
    // (falls back to the timed SF when no sibling exists). Untimed.
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.toString else sfDir
    }
    // Measurement-harness knobs (diagnosis, not the judged path):
    //  - SPARK_GRAFT_BENCH_ONLY=a,b,c restricts to named queries
    //  - SPARK_GRAFT_BENCH_SLICE=i/k keeps every k-th query (offset i)
    //    of the alphabetic order — "run the suite in two JVM halves"
    //    for separating real plan regressions from whole-suite JVM
    //    pressure (heap occupancy, code-cache growth) that one JVM
    //    accumulates over 250+ queries but two fresh JVMs do not
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    val slice = sys.env.get("SPARK_GRAFT_BENCH_SLICE").map { s =>
      val Array(i, k) = s.split('/').map(_.toInt); (i, k)
    }
    // slice indexes the FULL alphabetic order (as documented) even when
    // ONLY is also set — indexing the post-filter order would make the
    // same slice spec select different queries depending on ONLY
    val suite = SparkEntry.queries.toSeq.sortBy(_._1)
      .zipWithIndex
      .filter { case (_, idx) => slice.forall { case (i, k) => idx % k == i } }
      .map(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    suite.foreach { case (_, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      Tables.dropPersisted(spark)
    }
    // touch every timed-SF table once, full rows through the noop sink:
    // footers AND data pages reach the OS page cache (a count() would read
    // only row-group metadata). The code warm-up above ran on the sf0.001
    // files, so without this the first timed query per table pays its
    // cold-file cost (observed: fragment_stats pass1 3.4 s vs pass2 0.7 s)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // clearCache drops cached DATASETS but not localCheckpoint RDD blocks
    // (the LSH/CC family truncates lineage via eager localCheckpoint);
    // without an explicit unpersist those blocks leak across the suite and
    // the block manager / GC pressure taxes every later heavy query
    // (measured: dedup_apply 4.5-5.7 s in-suite vs 2.7 s isolated).
    // Nothing is shared across queries — each reconstructs its frames —
    // so dropping every persistent RDD between queries is safe.
    def dropPersisted(): Unit = Tables.dropPersisted(spark)

    // UNTIMED plan-identity pass: a normalized sha256 of each query's
    // pre-execution physical plan (AQE initial plan — deterministic
    // given code + files, unlike the runtime-stat-dependent final
    // plan). The close gate compares these against the PRIOR round's
    // TIMINGS to auto-clear bench-noise flags: a query >1.3x slower
    // whose plan sha is UNCHANGED is host noise by construction (the
    // r13/r14 hand-diff of normalized PLANS, mechanized). The
    // normalization strips exactly the per-JVM counters those hand
    // diffs stripped: expression ids, plan ids, codegen stage ids,
    // RDD/cache ids, HOF lambda variable counters, temp/warehouse
    // paths. The pass drives the query's SINK never — but builders
    // with eager construction-time work (anchor/codebook collects,
    // localCheckpoints of shared frames, warehouse artifact writes) do
    // run that work once more, exactly as every timed pass also does;
    // that is the price of hashing the real shipped plan (the warm-SF
    // alternative plans differently: broadcast decisions read file
    // sizes at planning time).
    //
    // ORDERING CONTRACT (VERDICT r16 #5): the sha pass runs BEFORE the
    // first timed rep. Builders with construction-time side effects
    // (warehouse artifact writes, persisted-anchor saves) must mutate
    // those artifacts before timing starts, never after — a post-timing
    // mutation would mean the published minima were measured against
    // artifacts a later untimed pass then silently replaced. Running
    // the sha pass first also serves as one extra timed-SF warm pass
    // for every query's planning path.
    def normalizePlan(p: String): String = p
      .replaceAll("#\\d+", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[codegen id : \\d+\\]", "[codegen id : x]")
      .replaceAll("Scan ExistingRDD\\[[^\\]]*\\]", "Scan ExistingRDD[x]")
      .replaceAll("ExistingRDD \\[[^\\]]*\\]", "ExistingRDD [x]")
      .replaceAll("lambda x_\\d+", "lambda x_n")
      .replaceAll("cachedrdd_\\d+", "cachedrdd_x")
      .replaceAll("file:[^\\s,\\)\\]\\}]*", "file:x")
      .replaceAll("Statistics\\([^)]*\\)", "Statistics(x)")
      // RDD ids differ per JVM and callsite LINE NUMBERS drift with any
      // code motion in a shared file (the r15 close's 20 flagged movers
      // all "differed" from r14's PLANS only by these two tokens) — both
      // are identity-irrelevant
      .replaceAll("MapPartitionsRDD\\[\\d+\\]", "MapPartitionsRDD[x]")
      .replaceAll("\\.scala:\\d+", ".scala:x")
    val planShas: Seq[(String, String)] = suite.map { case (name, fn) =>
      val sha =
        try {
          val norm = normalizePlan(
            fn(spark, sfDir).queryExecution.executedPlan.toString)
          java.security.MessageDigest.getInstance("SHA-256")
            .digest(norm.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
        } catch { case _: Throwable => "" }
      dropPersisted()
      (name, sha)
    }
    // a failing sha pass must be VISIBLE in the artifact (ADVICE r15): an
    // empty sha silently keeps its query flagged in every future close —
    // a systematically failing normalization would read as "nothing to
    // clear" forever. The count makes that failure mode loud.
    val planShaErrors = planShas.count(_._2.isEmpty)

    // timed passes: noop-sink write (consumes full rows, writes nothing),
    // cold dataset cache per query
    def timedPass(): Seq[(String, Double, Option[String])] =
      suite.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val outcome =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
        dropPersisted()
        (name, (System.nanoTime() - t0) / 1e9, outcome)
      }
    val passes = (1 to reps).map(_ => timedPass())

    // per query: min over successful passes; an error in ANY pass marks
    // the query failed (loud, never averaged away)
    val results = passes.head.indices.map { i =>
      val name = passes.head(i)._1
      val runs = passes.map(_(i))
      val err = runs.flatMap(_._3).headOption
      (name, runs.map(_._2), err)
    }
    val ok = results.filter(_._3.isEmpty)
    val qs = results
      .map { case (k, runs, err) =>
        s""""${esc(k)}":${if (err.isEmpty) runs.min else -1}"""
      }
      .mkString("{", ",", "}")
    val runsJson = results
      .map { case (k, runs, _) =>
        s""""${esc(k)}":[${runs.map(r => String.format(java.util.Locale.ROOT, "%.3f", Double.box(r))).mkString(",")}]"""
      }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      s""""${esc(k)}":"${esc(m.take(300))}""""
    }.mkString("{", ",", "}")
    val total = ok.map(_._2.min).sum
    // echo the subset knobs so a partial run can never be mistaken for a
    // full-suite artifact (close_round.sh asserts both are null)
    val onlyJson = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(v => s""""${esc(v)}"""").getOrElse("null")
    val sliceJson = sys.env.get("SPARK_GRAFT_BENCH_SLICE")
      .map(v => s""""${esc(v)}"""").getOrElse("null")
    val shasJson = planShas
      .map { case (k, v) => s""""${esc(k)}":"$v"""" }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""reps":$reps,"bench_only":$onlyJson,"bench_slice":$sliceJson,""" +
        s""""queries_runs":$runsJson,"plan_shas":$shasJson,""" +
        s""""plan_sha_errors":$planShaErrors,""" +
        s""""errors":$errs,"nOk":${ok.size},"nFailed":${results.size - ok.size},""" +
        s""""sf":"${esc(sfDir)}"}""")
    spark.stop()
  }
}
