package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join strategies for scale: salting for skewed keys and explicit
  * broadcast, complementing AQE's runtime skew splitting.
  *
  * AQE's skew-join handles post-shuffle partition imbalance, but it can
  * only split what is already shuffled — a single pathological key whose
  * rows exceed one executor's memory still needs SALTING: the fact side
  * spreads each key over `saltFactor` sub-keys, the dimension side is
  * replicated `saltFactor`× (explode over the salt range), and the join
  * key becomes (key, salt). Replication cost is |dim| × saltFactor, which
  * is the standard trade for unbounded hot keys.
  */
object Joins {

  /** Equi-join `fact ⋈ dim` on `key`, salted to defuse hot keys.
    * Output columns = fact.* ++ dim.* (minus the duplicate key). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // deterministic spread: hash the whole fact row across the salt range
    // (rand() would break retry/replay semantics of a failed task)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Broadcast-dimension equi-join, stated explicitly (Catalyst's
    * threshold heuristic can miss when size stats are stale). */
  def broadcastJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      joinType: String = "inner"): DataFrame =
    fact.join(broadcast(dim), Seq(key), joinType)

  /** Top-frequency keys of a column — the census used to decide whether a
    * join needs salting (run on a sample at scale). */
  def keyFrequency(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      // key tie-break: limits are only deterministic under a TOTAL order
      // (the house invariant every oracle-checked limit relies on)
      .orderBy(desc("n"), asc(key)).limit(topN)

  /** As-of join: for each left row, attach the most recent right row with
    * `right.ts <= left.ts` within the same `keys` group (the point-in-time
    * join behind feature lookups, price marks, "state at event time").
    * Spark has no ASOF JOIN operator; the naive formulations — a range
    * join (quadratic blow-up) or a per-row subquery — do not survive
    * scale. This is the scalable classic instead: tag both sides, union,
    * ONE shuffle on `keys`, and a partitioned running `last(ignoreNulls)`
    * window carries the latest right payload forward into each left row.
    * Cost is a single exchange + sort, identical to sessionization's
    * shape — including the whale-key caveat: one pathological key's whole
    * history sorts on ONE task (spillable, so it completes, but
    * serialized — `StressScale`'s `asof_whale` point measures it). When
    * staleness is bounded, [[asOfJoinBanded]] is the guard: it extends
    * the shuffle key with a time band and parallelizes the whale by time
    * at the cost of 2× the right side.
    *
    * Determinism: right rows sharing one (keys, ts) are ordered by
    * `seqCol` (a unique right-side column, e.g. its id) and the LAST one
    * wins; left rows order after right rows at equal ts (MaxValue seq),
    * so a right row at exactly `left.ts` matches (inclusive as-of).
    *
    * Output: left.* ++ (prefix+tsCol, attach.map(prefix+_)) — all null
    * when no right row precedes (left-outer semantics). `maxStaleness`
    * (same units as a numeric `tsCol`) nulls matches older than
    * `left.ts - maxStaleness`, evaluated AFTER the window: a too-stale
    * match is rejected, not replaced by an even staler one. */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      seqCol: String,
      attach: Seq[String],
      prefix: String = "asof_",
      maxStaleness: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoin needs at least one equi-key")
    val leftCols = left.columns.toSeq
    val outNames = (s"$prefix$tsCol" +: attach.map(c => s"$prefix$c")).toSet
    val clash = leftCols.toSet.intersect(outNames)
    require(clash.isEmpty,
      s"left columns collide with attached output names (change `prefix`): " +
        clash.mkString(", "))
    val rPayload = struct(
      (col(tsCol).as("__rts") +: attach.map(col)): _*)
    val rightTagged = right.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+
        col(seqCol).cast("long").as("__seq") :+ rPayload.as("__r")): _*)
    val lPayload = struct(leftCols.map(col): _*)
    val leftTagged = left.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+
        lit(Long.MaxValue).as("__seq") :+
        lit(null).cast(rightTagged.schema("__r").dataType).as("__r") :+
        lPayload.as("__l")): _*)
    val unioned = rightTagged.withColumn("__l",
      lit(null).cast(leftTagged.schema("__l").dataType))
      .unionByName(leftTagged)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = maxStaleness match {
      case Some(tol) => when(
        col("__ts") - matchedRaw.getField("__rts") <= tol, matchedRaw)
      case None => matchedRaw
    }
    unioned
      .withColumn("__m", matched)
      .filter(col("__l").isNotNull)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        (col("__m.__rts").as(s"$prefix$tsCol") +:
          attach.map(c => col(s"__m.$c").as(s"$prefix$c"))): _*)
  }

  /** Forward as-of join — [[asOfJoin]]'s mirror: for each left row,
    * attach the EARLIEST right row with `right.ts >= left.ts` within the
    * same `keys` group (the "time to next event" lookups: time to
    * conversion, next maintenance window, label lookahead). Same
    * scalable shape: tag, union, ONE shuffle on `keys`, and a running
    * `last(ignoreNulls)` window over the (ts, seq) DESCENDING order
    * carries the nearest future right payload back into each left row.
    *
    * Determinism: right rows sharing one (keys, ts) are ordered by
    * `seqCol` and the SMALLEST one wins (the first the descending scan
    * leaves behind); left rows order after right rows at equal ts
    * (MinValue seq in the descending order), so a right row at exactly
    * `left.ts` matches (inclusive). `maxHorizon` (same units as a
    * numeric `tsCol`) nulls matches farther than `left.ts + maxHorizon`,
    * evaluated AFTER the window: a too-distant match is rejected, not
    * replaced by an even more distant one. */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      seqCol: String,
      attach: Seq[String],
      prefix: String = "next_",
      maxHorizon: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asOfJoinForward needs at least one equi-key")
    val leftCols = left.columns.toSeq
    val outNames = (s"$prefix$tsCol" +: attach.map(c => s"$prefix$c")).toSet
    val clash = leftCols.toSet.intersect(outNames)
    require(clash.isEmpty,
      s"left columns collide with attached output names (change `prefix`): " +
        clash.mkString(", "))
    val rPayload = struct(
      (col(tsCol).as("__rts") +: attach.map(col)): _*)
    val rightTagged = right.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+
        col(seqCol).cast("long").as("__seq") :+ rPayload.as("__r")): _*)
    val lPayload = struct(leftCols.map(col): _*)
    val leftTagged = left.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+
        lit(Long.MinValue).as("__seq") :+
        lit(null).cast(rightTagged.schema("__r").dataType).as("__r") :+
        lPayload.as("__l")): _*)
    val unioned = rightTagged.withColumn("__l",
      lit(null).cast(leftTagged.schema("__l").dataType))
      .unionByName(leftTagged)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").desc, col("__seq").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = maxHorizon match {
      case Some(tol) => when(
        matchedRaw.getField("__rts") - col("__ts") <= tol, matchedRaw)
      case None => matchedRaw
    }
    unioned
      .withColumn("__m", matched)
      .filter(col("__l").isNotNull)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        (col("__m.__rts").as(s"$prefix$tsCol") +:
          attach.map(c => col(s"__m.$c").as(s"$prefix$c"))): _*)
  }

  /** [[asOfJoin]] with a BOUNDED-staleness contract, banded to defuse
    * whale keys: [[asOfJoin]]'s single shuffle partitions by `keys`
    * alone, so one hot key (every event on one user) serializes its
    * whole history onto ONE task — the sort spills (no OOM) but wall
    * time is that task ([[graft.tools.StressScale]]'s `asof_whale`
    * point measures it). When staleness is bounded anyway — most
    * attribution/feature-lookup joins are — the key can be EXTENDED with
    * a time band `ts floorDiv staleness`: a qualifying match for a left
    * row in band b is at most `staleness` old, i.e. lives in band b−1 or
    * b, so each right row is replicated into its own band and the next
    * (2× the right side, the standard trade), the shuffle spreads over
    * (keys, band), and the whale parallelizes by time. Semantics are
    * EXACTLY `asOfJoin(..., maxStaleness = Some(staleness))`: a global
    * latest-match older than band b−1 is out of staleness by
    * construction, so both formulations null it (parity pinned in
    * `JoinsSpec` on random streams). Floor division keeps negative
    * timestamps banding correctly (`div` truncates toward zero). */
  def asOfJoinBanded(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      seqCol: String,
      attach: Seq[String],
      staleness: Long,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asOfJoinBanded needs at least one equi-key")
    require(staleness > 0, "staleness must be positive")
    val leftCols = left.columns.toSeq
    val outNames = (s"$prefix$tsCol" +: attach.map(c => s"$prefix$c")).toSet
    val clash = leftCols.toSet.intersect(outNames)
    require(clash.isEmpty,
      s"left columns collide with attached output names (change `prefix`): " +
        clash.mkString(", "))
    // exact long floor division: the pmod subtraction (non-negative
    // remainder) makes the dividend an exact multiple of `staleness`, so
    // the truncating `div` IS the floor even for negative timestamps;
    // `/` would promote to double and lose exactness past 2^53
    val bandExpr =
      s"(__ts - pmod(__ts, ${staleness}L)) div ${staleness}L"
    val rPayload = struct(
      (col(tsCol).as("__rts") +: attach.map(col)): _*)
    val rightTagged = right.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+
        col(seqCol).cast("long").as("__seq") :+ rPayload.as("__r")): _*)
      // replicate into the row's own band and the next: the only two
      // bands whose left rows it can still serve within `staleness`
      .withColumn("__band",
        explode(array(expr(bandExpr), expr(bandExpr) + 1)))
    val lPayload = struct(leftCols.map(col): _*)
    val leftTagged = left.select(
      (keys.map(col) :+ col(tsCol).as("__ts") :+
        lit(Long.MaxValue).as("__seq") :+
        lit(null).cast(rightTagged.schema("__r").dataType).as("__r") :+
        lPayload.as("__l")): _*)
      .withColumn("__band", expr(bandExpr))
    val unioned = rightTagged.withColumn("__l",
      lit(null).cast(leftTagged.schema("__l").dataType))
      .unionByName(leftTagged)
    val w = Window.partitionBy((keys :+ "__band").map(col): _*)
      .orderBy(col("__ts"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__r"), ignoreNulls = true).over(w)
    val matched = when(
      col("__ts") - matchedRaw.getField("__rts") <= staleness, matchedRaw)
    unioned
      .withColumn("__m", matched)
      .filter(col("__l").isNotNull)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        (col("__m.__rts").as(s"$prefix$tsCol") +:
          attach.map(c => col(s"__m.$c").as(s"$prefix$c"))): _*)
  }

  /** Range (interval containment) join: pair each point row with every
    * interval row whose `[startCol, endCol]` contains `pointCol`
    * (optionally also matching `keys`). Spark's built-in plan for a
    * BETWEEN join predicate is BroadcastNestedLoop — O(|points| ×
    * |intervals|) and a non-starter at scale. This uses bin bucketing:
    * each interval is exploded to the fixed-width bins it covers, each
    * point belongs to exactly ONE bin, and the join becomes an equi-join
    * on the bin key with an exact containment post-filter. Each
    * qualifying pair is produced exactly once (the point's bin), so no
    * dedup pass is needed. Cost: one keyed shuffle of points + intervals
    * × avg-bins-per-interval — linear, AQE-skew-splittable.
    *
    * Skew guard: an interval spanning more than `maxBinsPerInterval`
    * bins (a "whale" — one row exploding into millions of bin keys) is
    * dropped, mirroring the LSH operators' `maxBucketSize` policy; size
    * `binWidth` near the typical interval length so common intervals
    * cover 1-2 bins. */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      keys: Seq[String] = Seq.empty,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint (rename first): ${overlap.mkString(", ")}")
    // exact integer division, NOT floor(c / w): double division of
    // nanosecond-epoch magnitudes (~1.7e18) is inexact near bin edges and
    // could bin a point outside its containing interval's bin range.
    // `div` truncates toward zero but is monotone, so s<=p<=e still
    // implies sbin<=pbin<=ebin — the only property binning needs.
    def bin(c: String): Column = expr(s"`$c` div ${binWidth}L")
    val s = col(startCol)
    val e = col(endCol)
    val binned = intervals
      .filter(e >= s && (bin(endCol) - bin(startCol)) < maxBinsPerInterval)
      .withColumn("__bin", explode(sequence(bin(startCol), bin(endCol))))
    val pointsBinned = points.withColumn("__bin", bin(pointCol))
    pointsBinned
      .join(binned, (keys :+ "__bin").toSeq)
      .filter(col(pointCol).between(s, e))
      .drop("__bin")
  }

  /** Interval-overlap join: pair every left interval `[lStart, lEnd]`
    * with every right interval `[rStart, rEnd]` that overlaps it
    * (`lStart <= rEnd AND rStart <= lEnd`, optionally key-matched) — the
    * session-vs-outage / exposure-vs-campaign shape that a BETWEEN
    * predicate would again turn into a BroadcastNestedLoop. Same bin
    * bucketing as [[rangeJoin]], with BOTH sides exploded to their
    * covered bins; a pair sharing several bins is emitted exactly once
    * via the first-overlap-bin rule (`bin == bin(max(lStart, rStart))`,
    * a per-row predicate) so no distinct pass is needed. Whale guard on
    * both sides. */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      binWidth: Long,
      keys: Seq[String] = Seq.empty,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns must be disjoint (rename first): ${overlap.mkString(", ")}")
    def bin(c: String): Column = expr(s"`$c` div ${binWidth}L")
    val lb = left
      .filter(col(lEnd) >= col(lStart) &&
        (bin(lEnd) - bin(lStart)) < maxBinsPerInterval)
      .withColumn("__bin", explode(sequence(bin(lStart), bin(lEnd))))
    val rb = right
      .filter(col(rEnd) >= col(rStart) &&
        (bin(rEnd) - bin(rStart)) < maxBinsPerInterval)
      .withColumn("__bin", explode(sequence(bin(rStart), bin(rEnd))))
    lb.join(rb, (keys :+ "__bin").toSeq)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // emit once: only in the first bin both intervals cover
      .filter(col("__bin") ===
        expr(s"greatest(`$lStart`, `$rStart`) div ${binWidth}L"))
      .drop("__bin")
  }

  /** Bloom semi-join reduction: build a Bloom filter over the dimension's
    * join keys (one aggregation of the SMALL side), pre-filter the fact
    * side with it BEFORE the join's shuffle, then run the exact join.
    * When the dimension is selective (a filtered slice of parts, a
    * benchmark id list), the fact side's shuffle shrinks by roughly the
    * selectivity — on a 100 TB fact table that is the difference between
    * shuffling everything and shuffling the ~1% that can match. Results
    * are EXACTLY the plain join's: a Bloom filter has no false negatives
    * (nothing that matches is dropped) and its false positives are
    * removed by the exact join that follows — which is also why the
    * reduction is only sound for inner/semi joins (an outer fact side
    * must keep its non-matching rows). Same broadcast-a-sketch shape as
    * [[graft.operators.Curation]]'s Bloom decontamination tier, pointed
    * at join reduction (the engine-internal runtime-filter idea, stated
    * explicitly in the API). */
  def bloomFilteredJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      fpp: Double = 0.01,
      expectedItems: Long = 1L << 20,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_semi",
      s"bloom reduction drops non-matching fact rows — unsound for $joinType")
    import org.apache.spark.sql.graft.BloomFunctions
    val built = dim
      .agg(count(lit(1)).as("__n"),
        BloomFunctions.bloomBuild(col(key).cast("string"), expectedItems, fpp)
          .as("__bloom"))
      .collect()(0)
    require(built.getAs[Long]("__n") <= expectedItems,
      s"dim has ${built.getAs[Long]("__n")} keys > expectedItems=" +
        s"$expectedItems; raise expectedItems to keep the fpp contract")
    val bloom = built.getAs[Array[Byte]]("__bloom")
    fact
      .filter(BloomFunctions.bloomContains(col(key).cast("string"), bloom))
      .join(dim, Seq(key), joinType)
  }

  /** Persist a table bucketed (and sorted) by the join key: two tables
    * bucketed the same way join with NO exchange on either side — the
    * co-location is decided at write time, which is how a 100 TB fact
    * table avoids re-shuffling on every join. Registers in the session
    * catalog (a metastore carries the bucket spec in production). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      nBuckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
    // an explicit path makes the table EXTERNAL (scratch-dir friendly for
    // repeated bench/verify evaluations); default stays catalog-managed
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Blocked fuzzy self-join (record linkage): pair rows sharing a
    * blocking key whose name strings score at or above `threshold` under
    * the native Jaro–Winkler comparator
    * ([[org.apache.spark.sql.graft.JaroWinkler]]) — the standard
    * blocking + pairwise-comparison shape of entity resolution (Fellegi–
    * Sunter linkage; reference's exact-match get-or-create at
    * `sentinel-core` `processors/RunsProcessor.scala` is the degenerate
    * threshold=1 tier of this).
    *
    * Scale shape: an EQUI-join on the block key — never a corpus cross
    * join; pair work is Σ n_b² over block sizes, whale blocks sub-split
    * by [[Guards.subSplit]] (`maxBlockSize`, identical results while the
    * guard is idle, documented in-whale recall trade when it fires — the
    * low-cardinality blocking key IS the skew case at 100 TB). The JW
    * comparator runs AFTER the id< pair cut, on each candidate pair
    * exactly once.
    *
    * @return (block, id_a, id_b, name_a, name_b, jw) with id_a < id_b */
  def fuzzyJoin(
      rows: DataFrame,
      blockCol: String,
      idCol: String,
      nameCol: String,
      threshold: Double,
      maxBlockSize: Int = 4096): DataFrame = {
    require(threshold >= 0.0 && threshold <= 1.0, s"threshold in [0,1]: $threshold")
    // Spread the input: at bench scale the whole query — sub-split
    // census join included — collapses to broadcast joins fused onto a
    // 1-partition file scan, running every JW comparison on one task
    // (4.2 s of the query's 4.6 s at sf0.1). The comparator pass is
    // CPU-bound, so parallelism must come from the scan side.
    val slim = Guards.subSplit(
      Fan.spread(rows.select(col(blockCol).as("block"), col(idCol).as("id"),
        col(nameCol).as("name"))),
      "block", "id", maxBlockSize)
    val a = slim.select(col("block"), col("__sub"),
      col("id").as("id_a"), col("name").as("name_a"))
    val b = slim.select(col("block"), col("__sub"),
      col("id").as("id_b"), col("name").as("name_b"))
    val jw = org.apache.spark.sql.graft.TextExpressionFunctions
      .jaroWinklerColumn(col("name_a"), col("name_b"))
    a.join(b, Seq("block", "__sub"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw", jw)
      .filter(col("jw") >= threshold)
      .drop("__sub")
  }

  /** Resample an irregular per-key time series onto a REGULAR grid with
    * linear interpolation — the feature-engineering staple (irregular
    * sensor/event values → fixed-step model inputs) built by COMPOSING
    * the as-of machinery: one backward [[asOfJoin]] brackets each grid
    * point from the left, one [[asOfJoinForward]] from the right, and
    * the interpolation is a single row-local IEEE expression between the
    * two exact bracket values.
    *
    * Grid: for each key, points t = k·`stepUs` with min(ts) ≤ t ≤
    * max(ts) (one keyed bounds agg + an engine-side `sequence` explode —
    * no driver state). Every grid point has both brackets by
    * construction. A grid point landing EXACTLY on an event returns
    * that event's value (the `next_ts > asof_ts` guard short-circuits
    * the 0/0).
    *
    * Scale shape: two as-of joins = two key-shuffled spillable-sort
    * windows (the [[asOfJoin]] contract, whale caveat and banded escape
    * hatch included); the grid is span/step rows per key, never
    * event-scale. Determinism: bracket choice inherits the as-of tie
    * rules (seqCol-ordered), interpolation is one IEEE expression from
    * exact inputs.
    *
    * @return (keys, ts = grid point, value = interpolated, 6-rounded) */
  def resampleInterpolate(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valCol: String,
      seqCol: String,
      stepUs: Long): DataFrame = {
    require(stepUs > 0, s"step must be positive: $stepUs")
    val kCols = keys.map(col)
    val grid = events
      .groupBy(kCols: _*)
      .agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
      // ceil(lo/step)*step .. floor(hi/step)*step — `div` truncates
      // toward zero; timestamps are non-negative epochs here
      .withColumn("__s", expr(s"((__lo + ${stepUs - 1}) div $stepUs) * $stepUs"))
      .withColumn("__e", expr(s"(__hi div $stepUs) * $stepUs"))
      // keys whose span straddles no grid point drop BEFORE the
      // sequence (an inverted range would throw, not return empty)
      .filter(col("__s") <= col("__e"))
      .select(kCols :+
        explode(sequence(col("__s"), col("__e"), lit(stepUs))).as(tsCol): _*)
    val ev = events.select((kCols :+ col(tsCol) :+ col(seqCol) :+
      col(valCol)): _*)
    val back = asOfJoin(grid, ev, keys, tsCol, seqCol, Seq(valCol))
    val both = asOfJoinForward(back, ev, keys, tsCol, seqCol, Seq(valCol))
    val ta = col(s"asof_$tsCol")
    val tb = col(s"next_$tsCol")
    val ya = col(s"asof_$valCol")
    val yb = col(s"next_$valCol")
    both.select(kCols :+ col(tsCol) :+
      round(
        when(tb > ta,
          ya + (yb - ya) * ((col(tsCol) - ta).cast("double") /
            (tb - ta).cast("double")))
          .otherwise(ya), 6).as(valCol): _*)
  }

  /** Bloom-filter sizing advisor: the exact key census plus the
    * textbook geometry — m = ⌈−n·ln p / ln²2⌉ bits, k = round(m/n·ln 2)
    * hashes — a 100 TB join planner consults before committing to a
    * [[bloomFilteredJoin]] (an undersized filter silently degrades to a
    * pass-through; an oversized one evicts executor cache). Cost: one
    * distinct count; the formula is one fixed IEEE expression over the
    * exact n, replayed textually in SQL.
    *
    * @return one row (key_col, n_keys, fpp, m_bits, k_hashes,
    *         bits_per_key, mib) */
  def bloomSizing(
      df: DataFrame,
      keyCol: String,
      fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp in (0,1): $fpp")
    val nD = col("n_keys").cast("double")
    val mRaw = ceil(-(nD * log(lit(fpp))) / (log(lit(2.0)) * log(lit(2.0))))
    df.agg(countDistinct(col(keyCol)).as("n_keys"))
      .select(lit(keyCol).as("key_col"), col("n_keys"), lit(fpp).as("fpp"),
        when(col("n_keys") > 0, mRaw).as("m_bits"),
        when(col("n_keys") > 0,
          greatest(lit(1L),
            round(mRaw.cast("double") / nD * log(lit(2.0)))
              .cast("bigint"))).as("k_hashes"),
        when(col("n_keys") > 0,
          round(mRaw.cast("double") / nD, 2)).as("bits_per_key"),
        when(col("n_keys") > 0,
          round(mRaw.cast("double") / lit(8388608.0), 2)).as("mib"))
  }

  /** Join ADVISOR — the optimizer-statistics census a planner consults
    * before committing a 100 TB join strategy, as an explicit exact
    * report: row counts per side, the EXACT join output size
    * (Σ_k n_L(k)·n_R(k) over matching keys — the quantity cost models
    * only estimate), each side's heaviest-key mass in ppm, and a
    * rule-based recommendation (broadcast the small side; salt when one
    * key carries more than `skewPpm` of a side; else shuffle). AQE
    * makes these calls from runtime samples; this report makes them
    * from exact counts, which is what you want when the answer decides
    * hours of cluster time — and its cost is two keyed counts plus a
    * key-frame join, NOT the join itself.
    *
    * Exactness: everything is integer counts; the join size accumulates
    * as a decimal product (n_L(k)·n_R(k) in DECIMAL(38,0) — two
    * 10⁹-row whale sides would overflow a long DURING the sum) but is
    * EMITTED as BIGINT behind a fail-fast overflow gate (`raise_error`
    * past 2⁶³−1), because a gate-facing output column must be a type
    * every downstream hasher treats identically — decimals are not;
    * ppm masses are integer div; the recommendation CASE compares exact
    * integers. `salt_factor` closes the advisor→executor loop: the
    * exact fan-out `ceil(max_top_key_rows / targetPartitionRows)`
    * (integer ceil-div, min 1) that [[saltedJoin]] should be handed
    * when the recommendation is `salt_skewed_key`. Replays exactly in
    * SQL. The payoff is MEASURED, not asserted:
    * `graft.tools.StressScale`'s `join_whale_unsalted` /
    * `join_whale_salted_advisor` pair runs a planted-whale join both
    * ways, the salted side driven by this advisor's own `salt_factor`
    * (STRESS_r13: the salted variant wins on the whale with broadcast
    * and AQE skew-splitting out of play).
    *
    * @return one row: (n_left, n_right, n_join_rows, n_keys_left,
    *         n_keys_right, n_keys_common, top_key_ppm_left,
    *         top_key_ppm_right, salt_factor, recommendation) */
  def joinAdvisor(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      broadcastRows: Long = 1000000L,
      skewPpm: Long = 100000L,
      targetPartitionRows: Long = 2000000L): DataFrame = {
    require(broadcastRows > 0 && skewPpm > 0 && targetPartitionRows > 0,
      "positive thresholds")
    def census(df: DataFrame) = df
      .groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // totals + join-size both read it
    val l = census(left)
    val r = census(right)
    def totals(c: DataFrame, sfx: String) = c.agg(
      sum(col("__c")).as(s"n_$sfx"),
      count(lit(1)).as(s"n_keys_$sfx"),
      max(col("__c")).as(s"__top_$sfx"))
    val joinSize = l.join(r, Seq("__k"))
      .agg(
        coalesce(sum(l("__c").cast("decimal(19,0)") *
          r("__c").cast("decimal(19,0)")), lit(0).cast("decimal(38,0)"))
          .as("n_join_rows"),
        count(lit(1)).as("n_keys_common"))
    val one = totals(l, "left")
      .crossJoin(broadcast(totals(r, "right")))
      .crossJoin(broadcast(joinSize))
      .withColumn("top_key_ppm_left",
        expr("(__top_left * 1000000L) div n_left"))
      .withColumn("top_key_ppm_right",
        expr("(__top_right * 1000000L) div n_right"))
    val longMax = lit("9223372036854775807").cast("decimal(38,0)")
    one.select(
      col("n_left"), col("n_right"),
      // gate-facing outputs carry NO decimal columns (driver hashers
      // disagree on them); the decimal sum stays internal, the emit is
      // BIGINT behind a fail-fast overflow gate
      when(col("n_join_rows") > longMax,
        raise_error(lit("joinAdvisor: exact join size overflows BIGINT")))
        .otherwise(col("n_join_rows").cast("bigint")).as("n_join_rows"),
      col("n_keys_left"), col("n_keys_right"), col("n_keys_common"),
      col("top_key_ppm_left"), col("top_key_ppm_right"),
      greatest(lit(1L),
        expr(s"(greatest(__top_left, __top_right) + " +
          s"${targetPartitionRows - 1L}L) div ${targetPartitionRows}L"))
        .as("salt_factor"),
      when(col("n_right") <= broadcastRows, lit("broadcast_right"))
        .when(col("n_left") <= broadcastRows, lit("broadcast_left"))
        .when(col("top_key_ppm_left") > skewPpm ||
          col("top_key_ppm_right") > skewPpm, lit("salt_skewed_key"))
        .otherwise(lit("shuffle_hash")).as("recommendation"))
  }
}
