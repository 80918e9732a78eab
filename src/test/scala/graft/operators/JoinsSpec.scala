package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Seq(
    (1L, "hot", 10.0), (2L, "hot", 20.0), (3L, "hot", 30.0),
    (4L, "cold", 40.0), (5L, "warm", 50.0)
  ).toDF("id", "k", "v")

  private lazy val dim = Seq(
    ("hot", "H"), ("cold", "C"), ("warm", "W"), ("unused", "U")
  ).toDF("k", "label")

  "saltedJoin" should "produce exactly the plain-join result" in {
    val plain = fact.join(dim, Seq("k")).select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Joins.saltedJoin(fact, dim, "k", saltFactor = 4)
      .select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    salted shouldBe plain
    salted should have size 5
  }

  it should "support left joins preserving unmatched fact rows" in {
    val extra = fact.union(Seq((6L, "nokey", 0.0)).toDF("id", "k", "v"))
    val r = Joins.saltedJoin(extra, dim, "k", saltFactor = 3, joinType = "left")
    r.count() shouldBe 6
    r.filter(col("k") === "nokey").select("label").collect()(0).isNullAt(0) shouldBe true
  }

  it should "spread a hot key over multiple salt values" in {
    val many = (1L to 200L).map(i => (i, "hot", i.toDouble)).toDF("id", "k", "v")
    val salts = many.withColumn("__salt",
      pmod(xxhash64(many.columns.map(col): _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    salts should be > 4L // 200 distinct rows hash across most of 8 buckets
  }

  "asOfJoinForward" should "attach the earliest future right row, inclusive at equal ts" in {
    val lefts = Seq((1L, "a", 100L), (2L, "a", 205L), (3L, "b", 50L), (4L, "c", 10L))
      .toDF("id", "key", "ts")
    val rights = Seq(
      (11L, "a", 100L), // equal ts: must match left 1 (inclusive)
      (12L, "a", 150L), (13L, "a", 300L),
      (14L, "b", 40L)   // in the past: must NOT match left 3
    ).toDF("rid", "key", "ts")
    val r = Joins.asOfJoinForward(lefts, rights, Seq("key"), "ts",
      seqCol = "rid", attach = Seq("rid"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(4)) None else Some(x.getLong(4)))).toMap
    r(1L) shouldBe Some(11L)
    r(2L) shouldBe Some(13L)
    r(3L) shouldBe None // only past rights exist for b
    r(4L) shouldBe None // no rights at all for c
  }

  it should "pick the smallest seq among equal-ts candidates and honor the horizon" in {
    val lefts = Seq((1L, "a", 100L)).toDF("id", "key", "ts")
    val rights = Seq((22L, "a", 120L), (21L, "a", 120L), (30L, "a", 500L))
      .toDF("rid", "key", "ts")
    val near = Joins.asOfJoinForward(lefts, rights, Seq("key"), "ts",
      seqCol = "rid", attach = Seq("rid")).collect()(0)
    near.getLong(4) shouldBe 21L // deterministic tie: smallest seq
    // horizon 10: the nearest match (dt 20) is too far -> null, NOT 500
    val gated = Joins.asOfJoinForward(lefts, rights, Seq("key"), "ts",
      seqCol = "rid", attach = Seq("rid"), maxHorizon = Some(10L)).collect()(0)
    gated.isNullAt(4) shouldBe true
  }

  "bloomFilteredJoin" should "produce exactly the plain-join result" in {
    val bigFact = (1L to 500L).map(i => (i, s"k${i % 50}", i.toDouble))
      .toDF("id", "k", "v")
    val selDim = Seq(("k3", "A"), ("k17", "B"), ("k42", "C")).toDF("k", "label")
    val plain = bigFact.join(selDim, Seq("k")).select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val reduced = Joins.bloomFilteredJoin(bigFact, selDim, "k", fpp = 0.01)
      .select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    reduced shouldBe plain
    reduced should have size 30
  }

  it should "reject outer joins (the reduction drops non-matching fact rows)" in {
    an[IllegalArgumentException] should be thrownBy
      Joins.bloomFilteredJoin(fact, dim, "k", joinType = "left")
  }

  it should "fail loudly when the dim overfills the filter" in {
    val bigDim = (1L to 100L).map(i => (s"k$i", "x")).toDF("k", "label")
    an[IllegalArgumentException] should be thrownBy
      Joins.bloomFilteredJoin(fact, bigDim, "k", expectedItems = 10L)
  }

  "broadcastJoin" should "force a broadcast hash join" in {
    val plan = Joins.broadcastJoin(fact, dim, "k")
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  "keyFrequency" should "rank keys by count" in {
    val r = Joins.keyFrequency(fact, "k").collect()
    r(0).getString(0) shouldBe "hot"
    r(0).getLong(1) shouldBe 3L
  }

  private lazy val trades = Seq(
    (1L, "a", 100L, 9.0), (2L, "a", 205L, 8.0), (3L, "b", 50L, 7.0)
  ).toDF("id", "key", "ts", "px")

  private lazy val quotes = Seq(
    (10L, "a", 100L, 1.0), // equal-ts → inclusive match for trade 1
    (11L, "a", 200L, 2.0),
    (12L, "a", 200L, 3.0), // equal-ts tie among quotes → max seq wins
    (13L, "b", 60L, 9.0)   // after trade 3 → never matched
  ).toDF("qid", "key", "ts", "qv")

  private def asOfRows(maxStaleness: Option[Long] = None) =
    Joins.asOfJoin(trades, quotes, Seq("key"), "ts", "qid", Seq("qid", "qv"),
      maxStaleness = maxStaleness)
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Long]("asof_qid")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong))).toMap

  "asOfJoin" should "attach the most recent right row at or before each left ts" in {
    val m = asOfRows()
    m(1L) shouldBe (Some(10L), Some(100L)) // inclusive: right at exactly left.ts
    m(2L) shouldBe (Some(12L), Some(200L)) // tie at ts=200 broken by max seq
    m(3L) shouldBe (None, None)            // only future right rows → left-outer nulls
  }

  it should "preserve every left row and column" in {
    val out = Joins.asOfJoin(trades, quotes, Seq("key"), "ts", "qid", Seq("qv"))
    out.count() shouldBe 3
    out.columns.toSeq shouldBe Seq("id", "key", "ts", "px", "asof_ts", "asof_qv")
  }

  it should "null out matches older than maxStaleness without substituting staler ones" in {
    // trade 2 at 205 matches quote at 200: staleness 5
    asOfRows(maxStaleness = Some(5L))(2L) shouldBe (Some(12L), Some(200L))
    asOfRows(maxStaleness = Some(4L))(2L) shouldBe (None, None)
  }

  it should "match a naive per-row maximum on random data" in {
    val rnd = new scala.util.Random(7)
    val l = (1L to 80L).map(i => (i, s"k${rnd.nextInt(5)}", rnd.nextLong(500L)))
      .toDF("id", "key", "ts")
    val r = (101L to 160L).map(i => (i, s"k${rnd.nextInt(5)}", rnd.nextLong(500L), i * 1.0))
      .toDF("qid", "key", "ts", "qv")
    val got = Joins.asOfJoin(l, r, Seq("key"), "ts", "qid", Seq("qid"))
      .collect().map(x => x.getAs[Long]("id") ->
        Option(x.getAs[java.lang.Long]("asof_qid")).map(_.toLong)).toMap
    // naive oracle: per left row, the right row with max (ts, qid) among
    // rights at-or-before it in the same key group
    val rights = r.collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val expected = l.collect().map { x =>
      val (id, key, ts) = (x.getLong(0), x.getString(1), x.getLong(2))
      val cands = rights.filter(q => q._2 == key && q._3 <= ts)
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy(q => (q._3, q._1))._1))
    }.toMap
    got shouldBe expected
  }

  it should "reject left columns that collide with attached output names" in {
    an[IllegalArgumentException] should be thrownBy
      Joins.asOfJoin(trades.withColumn("asof_ts", lit(0L)), quotes,
        Seq("key"), "ts", "qid", Seq("qv"))
  }

  "asOfJoinBanded" should "equal asOfJoin(maxStaleness) exactly on random streams" in {
    // the whale-key escape hatch must be a pure PLAN change: same rows,
    // same columns, same nulls — including timestamps straddling band
    // boundaries and negative timestamps (floor-banding, not truncation)
    val rnd = new scala.util.Random(23)
    val l = (1L to 120L).map(i =>
      (i, s"k${rnd.nextInt(4)}", rnd.nextLong(600L) - 100L))
      .toDF("id", "key", "ts")
    val r = (201L to 300L).map(i =>
      (i, s"k${rnd.nextInt(4)}", rnd.nextLong(600L) - 100L, i * 1.0))
      .toDF("qid", "key", "ts", "qv")
    for (staleness <- Seq(7L, 50L, 1000L)) {
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      val plain = Joins.asOfJoin(l, r, Seq("key"), "ts", "qid",
        Seq("qid", "qv"), maxStaleness = Some(staleness))
      val banded = Joins.asOfJoinBanded(l, r, Seq("key"), "ts", "qid",
        Seq("qid", "qv"), staleness = staleness)
      banded.columns.toSeq shouldBe plain.columns.toSeq
      withClue(s"staleness=$staleness: ") {
        canon(banded) shouldBe canon(plain)
      }
    }
  }

  it should "spread one whale key across time bands in the shuffle" in {
    val l = (1L to 50L).map(i => (i, "whale", i * 10L)).toDF("id", "key", "ts")
    val r = (101L to 150L).map(i => (i, "whale", i - 100L, 1.0))
      .toDF("qid", "key", "ts", "qv")
    val plan = Joins.asOfJoinBanded(l, r, Seq("key"), "ts", "qid", Seq("qid"),
      staleness = 20L).queryExecution.executedPlan.toString
    // the exchange and the window both key on (key, band)
    plan should include("__band")
    plan should include("hashpartitioning(key")
  }

  it should "shuffle once on the keys (single window, no range join)" in {
    val plan = Joins.asOfJoin(trades, quotes, Seq("key"), "ts", "qid", Seq("qv"))
      .queryExecution.executedPlan.toString
    plan should include("Window")
    (plan should not).include("NestedLoop")
  }

  private lazy val pts = Seq((1L, 5L), (2L, 10L), (3L, 99L)).toDF("pid", "x")
  private lazy val ivs = Seq(
    (10L, 0L, 5L),   // contains 5 at its end boundary
    (11L, 6L, 10L),  // contains 10
    (13L, 5L, 7L)    // contains 5 at its start boundary
  ).toDF("iid", "s", "e")

  "rangeJoin" should "pair points with containing intervals, boundaries inclusive" in {
    val got = Joins.rangeJoin(pts, ivs, "x", "s", "e", binWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 10L), (1L, 13L), (2L, 11L))
  }

  it should "match the naive BETWEEN join on random data" in {
    val rnd = new scala.util.Random(42)
    val p = (1L to 60L).map(i => (i, rnd.nextLong(1000L))).toDF("pid", "x")
    val iv = (1L to 40L).map { i =>
      val s = rnd.nextLong(1000L); (i, s, s + rnd.nextLong(120L))
    }.toDF("iid", "s", "e")
    val naive = p.crossJoin(iv).filter(col("x").between(col("s"), col("e")))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val binned = Joins.rangeJoin(p, iv, "x", "s", "e", binWidth = 50L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    binned shouldBe naive
    naive should not be empty
  }

  it should "drop whale intervals exceeding maxBinsPerInterval" in {
    val whale = Seq((99L, 0L, 1000L)).toDF("iid", "s", "e")
    val got = Joins.rangeJoin(pts, whale.union(ivs), "x", "s", "e",
      binWidth = 10L, maxBinsPerInterval = 50)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 101 bins ≥ 50 → the whale is excluded, everything else unchanged
    got shouldBe Set((1L, 10L), (1L, 13L), (2L, 11L))
  }

  it should "reject colliding non-key column names" in {
    an[IllegalArgumentException] should be thrownBy
      Joins.rangeJoin(pts, pts.withColumnRenamed("pid", "iid"), "x", "x", "x", 10L)
  }

  "intervalOverlapJoin" should "match a naive overlap cross-join, one row per pair" in {
    // intervals spanning multiple bins (binWidth 10), touching endpoints,
    // disjoint pairs, and a negative-coordinate case
    val l = Seq((1L, 0L, 25L), (2L, 30L, 31L), (3L, -15L, -5L), (4L, 100L, 200L))
      .toDF("l_id", "ls", "le")
    val r = Seq((10L, 20L, 40L), (11L, 31L, 33L), (12L, -6L, 4L), (13L, 500L, 600L))
      .toDF("r_id", "rs", "re")
    val got = Joins.intervalOverlapJoin(l, r, "ls", "le", "rs", "re", binWidth = 10L)
      .select("l_id", "r_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    val naive = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("l_id", "r_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).sorted
    got shouldBe naive
    // multi-bin overlapping pair (1,10) must appear exactly once
    got.count(_ == ((1L, 10L))) shouldBe 1
  }

  it should "drop whale intervals exceeding maxBinsPerInterval" in {
    val l = Seq((1L, 0L, 1000000L)).toDF("l_id", "ls", "le") // 100k bins
    val r = Seq((10L, 5L, 6L)).toDF("r_id", "rs", "re")
    Joins.intervalOverlapJoin(l, r, "ls", "le", "rs", "re",
      binWidth = 10L, maxBinsPerInterval = 1000).count() shouldBe 0L
  }

  behavior of "Joins.resampleInterpolate"

  it should "linearly interpolate between bracketing events on the grid" in {
    val ev = Seq(
      (1L, 0L, 1L, 10.0), (1L, 100L, 2L, 20.0), (1L, 250L, 3L, 50.0),
      // user 7: one event between grid points — span holds no grid
      // point, so the user contributes no rows (inverted range guard)
      (7L, 75L, 4L, 9.9)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = Joins.resampleInterpolate(
      ev, Seq("user_id"), "ts", "value", "event_id", stepUs = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    got shouldBe Map(
      (1L, 0L) -> 10.0, // exact hit
      (1L, 50L) -> 15.0, // 10 + 10·(50/100)
      (1L, 100L) -> 20.0, // exact hit
      (1L, 150L) -> 30.0, // 20 + 30·(50/150)
      (1L, 200L) -> 40.0,
      (1L, 250L) -> 50.0)
  }

  "fuzzyJoin" should "pair same-block names at or above the JW threshold, id_a < id_b" in {
    val names = Seq(
      (1L, "b1", "martha stewart"),
      (2L, "b1", "marhta stewart"), // transposition — well above 0.9
      (3L, "b1", "zzzz qqqq"), // unrelated
      (4L, "b2", "martha stewart"), // same name, DIFFERENT block: no pair
      (5L, "b2", "martha stewart")
    ).toDF("id", "blk", "nm")
    val got = Joins.fuzzyJoin(names, "blk", "id", "nm", threshold = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((1L, 2L), (4L, 5L))
  }

  it should "keep results identical while the sub-split guard is idle and stay bounded when it fires" in {
    val block = (1L to 40L).map(i => (i, "one", s"name number $i")).toDF("id", "blk", "nm")
    val loose = Joins.fuzzyJoin(block, "blk", "id", "nm", threshold = 0.8)
    val guarded = Joins.fuzzyJoin(block, "blk", "id", "nm", threshold = 0.8,
      maxBlockSize = 8)
    val looseN = loose.count()
    looseN should be > 0L
    // idle guard (default cap ≫ 40): identical result set
    Joins.fuzzyJoin(block, "blk", "id", "nm", threshold = 0.8, maxBlockSize = 4096)
      .collect().toSet shouldBe loose.collect().toSet
    // firing guard: a SUBSET (in-whale recall trade), never an overcount
    val g = guarded.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val l = loose.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    g.subsetOf(l) shouldBe true
    g.size.toLong should be < looseN
  }

  behavior of "bloomSizing"

  it should "emit the textbook geometry for the exact key census" in {
    // n = 1000, p = 0.01: m = ceil(1000·ln100/ln²2) = 9586 bits,
    // k = round(9.586·ln2) = 7 — the classic ~9.6 bits/key, 7 hashes
    val df = ((1L to 1000L) ++ (1L to 500L)).toDF("k") // dups collapse
    val r = Joins.bloomSizing(df, "k", fpp = 0.01).collect()(0)
    r.getString(0) shouldBe "k"
    r.getLong(1) shouldBe 1000L
    r.getLong(3) shouldBe 9586L
    r.getLong(4) shouldBe 7L
    r.getDouble(5) shouldBe 9.59 +- 1e-9
    // empty census: stated NULLs, not a division crash
    val e = Joins.bloomSizing(df.filter(col("k") < 0), "k").collect()(0)
    e.getLong(1) shouldBe 0L
    e.isNullAt(3) shouldBe true
  }

  behavior of "joinAdvisor"

  it should "compute the exact join size and recommend by size then skew" in {
    // left: keys 1..100 x 3 rows each; right: keys 1..50 x 2 rows + key 1
    // carrying 60 extra rows (the whale)
    val left = (1L to 100L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val right = ((1L to 50L).flatMap(k => Seq.fill(2)(k)) ++
      Seq.fill(60L.toInt)(1L)).toDF("k")
    val r = Joins.joinAdvisor(left, right, "k", broadcastRows = 10L)
      .collect()(0)
    r.getLong(0) shouldBe 300L
    r.getLong(1) shouldBe 160L
    // exact join size: key 1 matches 3x62, keys 2..50 match 3x2
    // (BIGINT emit — gate-facing output has no decimal columns)
    r.getLong(2) shouldBe (3L * 62 + 49L * 3 * 2)
    r.getLong(3) shouldBe 100L
    r.getLong(4) shouldBe 50L
    r.getLong(5) shouldBe 50L
    r.getLong(6) shouldBe (3L * 1000000L) / 300L
    r.getLong(7) shouldBe (62L * 1000000L) / 160L
    // salt factor: top key (62 rows) under default 2M target -> 1
    r.getLong(8) shouldBe 1L
    // right's whale key carries 387500 ppm > 10% -> salt
    r.getString(9) shouldBe "salt_skewed_key"
    // a small side wins over skew
    Joins.joinAdvisor(left, right, "k", broadcastRows = 200L)
      .collect()(0).getString(9) shouldBe "broadcast_right"
    // balanced keys and big sides -> plain shuffle
    Joins.joinAdvisor(left, left, "k", broadcastRows = 10L)
      .collect()(0).getString(9) shouldBe "shuffle_hash"
    // disjoint keys: zero join rows, zero common keys
    val disjoint = Joins.joinAdvisor(
      left, (200L to 220L).toDF("k"), "k", broadcastRows = 1L)
      .collect()(0)
    disjoint.getLong(2) shouldBe 0L
    disjoint.getLong(5) shouldBe 0L
  }

  it should "emit the exact ceil-div salt fan-out for the whale key" in {
    // whale key 1 carries 25 rows; target 8 rows/partition -> ceil(25/8)=4
    val left = (Seq.fill(25)(1L) ++ (2L to 9L)).toDF("k")
    val right = (1L to 9L).toDF("k")
    val r = Joins.joinAdvisor(left, right, "k", broadcastRows = 1L,
      targetPartitionRows = 8L).collect()(0)
    r.getLong(8) shouldBe 4L
    r.getString(9) shouldBe "salt_skewed_key"
    // and the fan-out feeds saltedJoin without changing join semantics
    val plain = left.join(right, Seq("k")).count()
    Joins.saltedJoin(left, right, "k",
      saltFactor = r.getLong(8).toInt).count() shouldBe plain
  }
}
