package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions => H, TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (the whole point of these shapes):
  *  - Exact dedup is a hash aggregate on a digest — one shuffle keyed by
  *    md5, partial-aggregated map-side; never a pairwise compare.
  *  - MinHash/SimHash near-dup avoids the O(n²) cross join: candidates
  *    come from an equi-join on band/bucket keys (shuffle on small keys),
  *    so cost is O(n) + O(candidate pairs).
  *  - Pairwise (n-gram Jaccard, embedding cosine) variants are *blocked*
  *    on a partition key (source / LSH bucket / IVF cell) so the
  *    quadratic term is per-block, not global — the only way a pairwise
  *    compare survives 100 TB.
  */
object Dedup {

  /** Exact duplicate groups by content digest: one row per distinct text
    * with its cluster size and the kept (minimum) id — the classic
    * keep-first exact dedup. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_md5"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col(idCol)).as("keep_id"))

  /** Near-duplicate candidate pairs via MinHash + LSH banding.
    * shingleN-char shingles → k-slot signature → `bands` band keys →
    * equi-join on band key. Returns distinct candidate pairs (a < b) with
    * the estimated Jaccard (fraction of matching signature slots).
    *
    * Physical shape (matters at 100 TB):
    *  - Signatures are computed by EXPLODING shingles and hash-aggregating
    *    `min(md5(i:shingle))` per doc — `md5`/`min` are codegen'd and the
    *    min partial-aggregates map-side, so the shuffle carries only k
    *    minima per doc. (The arrays-with-`transform` formulation is ~50×
    *    slower: Spark's higher-order functions are interpreted, and it
    *    re-walks the shingle array k times per doc.) Shingle duplicates
    *    don't change a min, so no distinct step is needed.
    *  - `maxBucketSize` caps the band-bucket self-join: one degenerate
    *    band key (empty/boilerplate docs) would otherwise produce a
    *    quadratic hot partition. Dropping over-full buckets is the
    *    standard LSH-dedup guard; the bucket census reuses the same
    *    shuffle key as the join, so it costs one cheap pre-aggregation.
    */
  /** Hash tiers for MinHash signatures: `PortableMd5` replays identically
    * in any engine (the oracle-checked path); `FastXx` uses Spark's
    * native xxhash64 — far cheaper per shingle, the production tier at
    * 100 TB where no cross-engine replay is needed. Measured honestly
    * (cold cache per query) the xx tier runs ~2.6x faster at sf0.1; an
    * earlier bench that showed it "slower" was reusing another query's
    * persisted md5 signatures across the suite. */
  sealed trait HashTier
  case object PortableMd5 extends HashTier
  case object FastXx extends HashTier

  /** Per-doc MinHash signatures: (id, sig: array<bigint>[k]).
    *
    * Lazy — no persist, no checkpoint. [[minhashCandidatePairs]] pipelines
    * it straight into banding and materializes only the slim banded frame
    * (see [[pairsFromSigs]]); [[minhashLsh]], whose score re-attach needs
    * the signatures themselves again, materializes this frame once via
    * eager `localCheckpoint` (invisible to the SQL cache; blocks freed by
    * the ContextCleaner once the result is dropped — nothing for a
    * long-lived session to leak).
    *
    * Physical shape (optimization r17, guide §2.4 "remove shuffles
    * outright" + §1.2 step 1): signatures are computed by ONE native
    * per-doc expression ([[org.apache.spark.sql.graft.MinhashSignature]])
    * — no shingle explode (~300× the corpus row count), no md5-hex →
    * `conv` re-parse, and, decisively, NO signature shuffle: the old
    * explode + `min()` hash aggregation shipped (id, k minima) per doc
    * through an exchange that this formulation removes from every MinHash
    * consumer. Values are bit-identical to [[minhashSignaturesSpec]]
    * (pinned by MinhashExpressionsSpec on the real corpus + adversarial
    * strings); the declarative form below stays as the executable spec.
    * Fan.spread still guards the compact-input case: the per-doc hash
    * loop is the expensive stage and must not run on one core. */
  def minhashSignatures(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 16,
      tier: HashTier = PortableMd5): DataFrame =
    Fan.spread(docs.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"),
        org.apache.spark.sql.graft.MinhashExpressionFunctions
          .minhashSigColumn(col("__t"), shingleN, k, tier == FastXx)
          .as("sig"))

  /** The declarative explode + md5/conv + min-aggregate formulation of
    * [[minhashSignatures]] — the executable reference spec the native
    * expression is pinned against (and the shape the DuckDB oracle
    * replays). Not on any query path. */
  private[graft] def minhashSignaturesSpec(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 16,
      tier: HashTier = PortableMd5): DataFrame = {
    // norm + positional explode: one row per (doc, shingle position).
    // Fan.spread: the explode below multiplies rows ~1000x — a compact
    // input must not run that on one core (see [[Fan]])
    // spread the RAW text, normalize after: repartition is a plan
    // barrier, so norm-then-spread would run the regex pass fused onto
    // the (often 1-partition) file scan — 1.6 s on one task at sf0.1
    val shingled = Fan.spread(docs.select(col(idCol).as("id"),
        col(textCol).as("__t")))
      .select(col("id"),
        regexp_replace(lower(col("__t")), "\\s+", " ").as("norm"))
      .select(col("id"), col("norm"),
        explode(sequence(lit(1),
          greatest(length(col("norm")) - lit(shingleN - 1), lit(1)))).as("pos"))
      .select(col("id"), col("norm").substr(col("pos"), lit(shingleN)).as("sh"))
    // k codegen'd seeded hash slots per shingle, partial-min-aggregated per
    // doc. Portable tier: k slots are the BIGINT values of the 8-hex-char
    // (32-bit) SLICES of ceil(k/4) seeded md5 digests. Two wins over the
    // naive one-md5-per-slot-as-string form: 4x fewer digests in the
    // explode-stage hot loop, and — because the min-agg buffers become
    // fixed-width longs instead of var-length strings — the signature
    // aggregate stays a codegen'd HashAggregate rather than falling back
    // to ObjectHashAggregate. DuckDB replays the slices verbatim
    // (('0x'||slice)::BIGINT).
    val hashed = tier match {
      case PortableMd5 =>
        val nDigests = (k + 3) / 4
        shingled
          .select(col("id") +: (0 until nDigests).map(d =>
            md5(concat(lit(s"$d:"), col("sh"))).as(s"d$d")): _*)
          .select(col("id") +: (0 until k).map(i =>
            conv(substring(col(s"d${i / 4}"), (i % 4) * 8 + 1, 8), 16, 10)
              .cast("bigint").as(s"h$i")): _*)
      case FastXx => shingled.select(
        col("id") +: (0 until k).map(i => xxhash64(lit(i), col("sh")).as(s"h$i")): _*)
    }
    val minAggs = (0 until k).map(i => min(col(s"h$i")).as(s"h$i"))
    hashed
      .groupBy(col("id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"),
        array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Distinct near-dup candidate pairs (id_a < id_b), WITHOUT the
    * estimated-Jaccard score — the frame to feed [[connectedComponents]].
    * Clustering needs only the pair topology; attaching `est_jaccard`
    * (two extra joins re-materializing signatures per side) is work an
    * inner-join-based plan cannot eliminate downstream, so the scored
    * variant [[minhashLsh]] is a separate operator layered on this one. */
  def minhashCandidatePairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 16,
      bands: Int = 8,
      maxBucketSize: Int = 1000,
      tier: HashTier = PortableMd5): DataFrame =
    pairsFromSigs(
      minhashSignatures(docs, textCol, idCol, shingleN, k, tier),
      k, bands, maxBucketSize, tier)

  /** The k/bands LSH band-key array of a signature column — ONE shared
    * definition so batch pair generation, incremental admission, and the
    * streaming admission gate can never disagree on the banding. */
  private def bandKeyArray(sig: Column, k: Int, bands: Int, tier: HashTier): Column = {
    require(bands > 0 && k % bands == 0,
      s"bands ($bands) must be positive and divide k ($k); " +
        "otherwise band keys degenerate and the join goes quadratic")
    val rowsPerBand = k / bands
    tier match {
      case PortableMd5 => H.lshBandKeys(sig, bands, rowsPerBand)
      case FastXx => array((0 until bands).map { b =>
        xxhash64((lit(b) +: (0 until rowsPerBand).map(r =>
          sig.getItem(b * rowsPerBand + r))): _*).cast("string")
      }: _*)
    }
  }

  /** Per-doc LSH band keys, exploded to (id, band) — the "posting list"
    * an admission gate joins against. Computed once over the corpus and
    * persisted, it is the index that lets a new batch (or stream) be
    * admitted WITHOUT re-deduplicating the corpus. */
  def bandKeys(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 16,
      bands: Int = 8,
      tier: HashTier = PortableMd5): DataFrame =
    minhashSignatures(docs, textCol, idCol, shingleN, k, tier)
      .select(col("id"), explode(bandKeyArray(col("sig"), k, bands, tier)).as("band"))

  private def pairsFromSigs(
      sigs: DataFrame,
      k: Int,
      bands: Int,
      maxBucketSize: Int,
      tier: HashTier): DataFrame = {
    val bandKeys = bandKeyArray(col("sig"), k, bands, tier)
    // eager localCheckpoint: the banded frame has TWO consumers whose
    // exchanges differ — the census shuffle partial-aggregates map-side,
    // the pair join's does not — so neither ReuseExchange nor AQE stage
    // reuse can collapse them, and without materialization the whole
    // shingle+signature pipeline upstream executes TWICE (measured as two
    // ~2 s scan+sig stage chains at sf0.1). The banded frame is tiny
    // (docs × bands rows of (id, 32-hex band)), the cheapest point to cut.
    val banded = sigs.select(col("id"), explode(bandKeys).as("band"))
      .localCheckpoint()
    // skew guard: drop band buckets larger than maxBucketSize
    val keptBands = banded.groupBy("band")
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBucketSize)
      .select("band")
    // EXPLICIT partition count on the self-join input: AQE coalesces by
    // shuffle BYTES, and the banded frame is tiny — but the join below
    // multiplies rows quadratically per bucket, so a byte-based coalesce
    // to one partition serializes the heavy stage. A numbered repartition
    // is exempt from AQE coalescing; hash-on-band keeps it join-aligned
    // (no further exchange) and both join sides read the ONE shared
    // exchange.
    val nPart = sigs.sparkSession.sparkContext.defaultParallelism
    val capped = banded.join(keptBands, Seq("band"))
      .repartition(nPart, col("band"))
    // Pair generation carries ONLY (band, id): a doc sharing several bands
    // with a partner would otherwise push its whole signature array
    // through the join and the distinct — for the md5 tier that is 8×32
    // bytes per side per candidate row, the dominant shuffle. Signatures
    // re-attach to the deduplicated pair set afterwards (two slim joins;
    // AQE broadcasts the sig table when it fits).
    val l = capped.select(col("band"), col("id").as("id_a"))
    val r = capped.select(col("band"), col("id").as("id_b"))
    // explicit repartition BEFORE the pair distinct (optimization r17,
    // guide §2.5): the distinct's own ENSURE_REQUIREMENTS exchange is
    // byte-coalesced by AQE, which ran the final dedup aggregate — and
    // every consumer fused above it (score re-attach, truth re-checks) —
    // on ONE task. A numbered repartition on the distinct key makes the
    // aggregate complete in place across the session's parallelism; the
    // shuffle carries at most `bands`× the deduped pair rows of two ids,
    // the price of trading the map-side partial for a wide final layout.
    l.join(r, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .repartition(nPart, col("id_a"), col("id_b"))
      .distinct()
  }

  def minhashLsh(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 16,
      bands: Int = 8,
      maxBucketSize: Int = 1000,
      tier: HashTier = PortableMd5): DataFrame = {
    // eager localCheckpoint, NOT a lazy rebuild per subtree: the banding
    // branch and the two score joins would each re-run the explode→hash→
    // min-agg pipeline (AQE's stage reuse does not collapse them — the
    // materialized stages sit under differently-shaped parents), and NOT
    // a persist: localCheckpoint blocks are invisible to the SQL cache
    // and the ContextCleaner frees them once the result frame is dropped
    val sigs = minhashSignatures(docs, textCol, idCol, shingleN, k, tier)
      .localCheckpoint()
    val pairs = pairsFromSigs(sigs, k, bands, maxBucketSize, tier)
    // codegen'd slot-match count (getItem + sum, no interpreted lambda)
    val matches = (0 until k)
      .map(i => when(col("sig_a").getItem(i) === col("sig_b").getItem(i), 1)
        .otherwise(0))
      .reduce(_ + _)
    pairs
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / k).as("est_jaccard"))
  }

  /** Cross-frame MinHash/LSH near-dup scores: for each (left, right)
    * candidate pair sharing an LSH band, the estimated Jaccard from
    * signature agreement — [[minhashLsh]]'s machinery pointed ACROSS two
    * frames instead of within one. Returns (id_l, id_r, est_jaccard);
    * both frames must carry `idCol`/`textCol`.
    *
    * Scale shape: the banded join is left×right per band — never
    * left×left — so a whale band on the left multiplies only against
    * that band's right-side bucket; the guard therefore caps the RIGHT
    * (reference) side at `maxBucketSize`, bounding the per-left-row
    * multiplier while the left corpus never pairwise-compares with
    * itself. With a benchmark-sized right frame its banded posting list
    * broadcasts (AQE), and the left corpus ships only slim (band, id)
    * rows. */
  def minhashLshCross(
      left: DataFrame,
      right: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 5,
      k: Int = 16,
      bands: Int = 8,
      maxBucketSize: Int = 1000,
      tier: HashTier = PortableMd5): DataFrame = {
    // both sigs have two consumers (banding, score re-attach): same
    // eager-localCheckpoint rationale as [[minhashLsh]]
    val sigsL = minhashSignatures(left, textCol, idCol, shingleN, k, tier)
      .localCheckpoint()
    val sigsR = minhashSignatures(right, textCol, idCol, shingleN, k, tier)
      .localCheckpoint()
    def banded(sigs: DataFrame, as: String): DataFrame = sigs.select(
      col("id").as(as), explode(bandKeyArray(col("sig"), k, bands, tier)).as("band"))
    val bandedR = banded(sigsR, "id_r")
    val keptBands = bandedR.groupBy("band").agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBucketSize).select("band")
    val cand = banded(sigsL, "id_l")
      .join(bandedR.join(keptBands, Seq("band")), Seq("band"))
      .select("id_l", "id_r").distinct()
    val matches = (0 until k)
      .map(i => when(col("sig_l").getItem(i) === col("sig_r").getItem(i), 1)
        .otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigsL.select(col("id").as("id_l"), col("sig").as("sig_l")), Seq("id_l"))
      .join(sigsR.select(col("id").as("id_r"), col("sig").as("sig_r")), Seq("id_r"))
      .select(col("id_l"), col("id_r"),
        (matches.cast("double") / k).as("est_jaccard"))
  }

  /** SimHash bucketing: docs sharing an identical nBits-bit SimHash are
    * near-dup candidates. Returns buckets with >1 member.
    *
    * Same physical shape as [[minhashLsh]]: explode tokens → one
    * codegen'd md5 per token → nBits codegen'd parity columns →
    * partial-sum hash agg per doc (the array-HOF formulation in
    * [[H.simhash]] is interpreted; kept for expression-level use). */
  /** Per-doc nBits-bit SimHash via the explode + codegen + partial-agg
    * shape (see [[simhashBuckets]]); returns (id, simhash). */
  def simhashPerDoc(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      nBits: Int = 16): DataFrame = {
    require(nBits <= 32, "md5 hex has 32 nibbles")
    // bit k of token t = low bit of hex nibble k of md5(t). One translate
    // maps odd nibbles to '1' / even to '0' for the whole digest, then each
    // bit is plain arithmetic (ascii-48) — far cheaper than nBits
    // substring-IN-set comparisons per token (8 string equality tests per
    // bit), and identical in value.
    val hashed = Fan.spread(docs.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), explode(T.tokens(col("__t"))).as("tok"))
      .select(col("id"),
        translate(md5(col("tok")), "13579bdf02468ace", "1111111100000000").as("b"))
    val parities = hashed.select(
      col("id") +: (0 until nBits).map(k =>
        (ascii(substring(col("b"), k + 1, 1)) - 48).cast("long").as(s"p$k")): _*)
    val aggs = count(lit(1)).as("n") +:
      (0 until nBits).map(k => sum(col(s"p$k")).as(s"p$k"))
    parities.groupBy("id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        (0 until nBits).map(k =>
          when(col(s"p$k") * 2 > col("n"), lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  def simhashBuckets(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      nBits: Int = 16): DataFrame =
    simhashPerDoc(docs, textCol, idCol, nBits)
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("keep_id"))
      .filter(col("n_docs") > 1)

  /** SimHash near-dup PAIRS under a Hamming-distance radius: identical
    * buckets miss near-misses, so band the hash (`nBands` contiguous
    * bit-groups — by pigeonhole, any two hashes within distance
    * `nBands − 1` share at least one full band), equi-join on band keys,
    * then filter exactly with codegen'd `bit_count(a XOR b)`. The classic
    * simhash dedup join; every step whole-stage codegen'd. */
  def simhashNearDup(
      docs: DataFrame,
      maxHamming: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id",
      nBits: Int = 32,
      nBands: Int = 4,
      maxBucketSize: Int = 1000): DataFrame = {
    require(nBits % nBands == 0, "bands must evenly split the hash bits")
    val bandBits = nBits / nBands
    val mask = (1L << bandBits) - 1
    // A simhash is ONE long, so — unlike minhash signatures (k×8 bytes,
    // see pairsFromSigs) — it rides through the banding and the pair join
    // for 8 bytes/row, and the Hamming distance computes inline from the
    // joined hashes. That removes the two score re-joins entirely AND
    // lets the radius filter run BEFORE the pair distinct, so the distinct
    // shuffle carries only true near-dups, not every band collision.
    //
    // Eager localCheckpoint on the slim banded frame: its census and join
    // consumers have non-collapsible exchanges (same reasoning as
    // pairsFromSigs); Fan.spread first so the materialization and
    // everything reading the pinned blocks stays parallel.
    val banded = Fan.spread(simhashPerDoc(docs, textCol, idCol, nBits))
      .select(col("id"), col("simhash"),
        explode(array((0 until nBands).map(b =>
          concat_ws(":", lit(b),
            shiftright(col("simhash"), b * bandBits) .bitwiseAND(mask)))
          : _*)).as("band"))
      .localCheckpoint()
    // the same skew guard as minhashLsh: simhash values of homogeneous
    // corpora concentrate, and one degenerate band bucket makes the
    // self-join quadratic
    val keptBands = banded.groupBy("band")
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBucketSize)
      .select("band")
    // numbered repartition: same AQE-coalesce exemption as pairsFromSigs —
    // the self-join's row fan-out is invisible to byte-based coalescing
    val capped = banded.join(keptBands, Seq("band"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("band"))
    capped.select(col("band"), col("id").as("id_a"), col("simhash").as("sh_a"))
      .join(capped.select(col("band"), col("id").as("id_b"), col("simhash").as("sh_b")),
        Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Apply near-dup clusters to the corpus — the step the whole dedup
    * family exists for: drop every clustered document except its
    * component's canonical keeper (the minimum id, which IS the component
    * label [[connectedComponents]] assigns). Unclustered documents pass
    * through untouched. One left-anti join against the non-keeper id set,
    * which is at most (clustered docs − clusters) rows.
    *
    * Join strategy is picked from the MEASURED loser count (optimization
    * r18, guide §3.1/§3.2) — the loser table comes off a checkpointed
    * label frame, so the planner has no statistics and falls back to a
    * corpus-scale SortMergeJoin (r17 plans: both sides exchanged even at
    * sf0.1 where the loser side is 14 rows):
    *  - `nLosers ≤ maxBroadcastLosers`: explicit broadcast anti-join —
    *    the corpus never shuffles;
    *  - above the guard (a loser set that genuinely doesn't broadcast —
    *    the 100 TB case where duplicates are a large corpus fraction):
    *    a Bloom filter over loser ids routes provable keepers around the
    *    join entirely, so the anti-join exchange carries only the
    *    bloom-positive sliver instead of the whole corpus
    *    ([[antiJoinLosers]]). */
  def applyClusters(
      docs: DataFrame,
      clusters: DataFrame,
      idCol: String = "doc_id",
      maxBroadcastLosers: Long = 4000000L): DataFrame = {
    // the loser count decides the join strategy; counting is a slim scan
    // because the label table rides connectedComponents' own checkpoints.
    // Below the guard the anti-join stays fully LAZY (the count is the
    // only extra job); only the Bloom path materializes the loser set,
    // since it probes it twice (filter build + join side)
    val losersBase = clusters.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    val nLosers = losersBase.count()
    if (nLosers <= maxBroadcastLosers)
      docs.join(broadcast(losersBase), Seq(idCol), "left_anti")
    else
      antiJoinLosers(docs, losersBase.localCheckpoint(), nLosers, idCol,
        maxBroadcastLosers)
  }

  /** The measured-size anti-join behind [[applyClusters]] /
    * [[applyClustersKeepBest]]: drop `losers` (an eagerly-materialized
    * slim id table of known row count) from `docs` without ever shuffling
    * the corpus.
    *
    * Below `maxBroadcastLosers` (default 4M ids ≈ tens of MB framed —
    * guide §3.1's comfortable broadcast range) the anti-join broadcasts
    * the loser side: zero corpus exchange. Above it, guide §3.2's Bloom
    * pre-filter applied to anti-join semantics: a Bloom filter over the
    * loser ids (1% fpp ≈ 9.6 bits/id; losers ≤ candidate pairs by
    * construction, so the filter is bounded) splits the corpus into
    * bloom-NEGATIVE rows — provably not losers, kept with no join at
    * all — and the bloom-positive sliver, which alone pays the anti-join
    * exchange (false positives cost extra join input, never a wrong
    * result). The corpus is scanned twice in that regime; at the scale
    * where the bloom path engages, two columnar scans are far cheaper
    * than one full-corpus shuffle (guide §1.3 napkin math). The bloom
    * path needs an integral id to probe the filter; non-integral ids
    * above the guard keep the sort-merge anti-join (correct, just the
    * pre-r18 shape). */
  private def antiJoinLosers(
      docs: DataFrame,
      losers: DataFrame,
      nLosers: Long,
      idCol: String,
      maxBroadcastLosers: Long): DataFrame = {
    import org.apache.spark.sql.types._
    val integralId = docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (nLosers <= maxBroadcastLosers)
      docs.join(broadcast(losers), Seq(idCol), "left_anti")
    else if (!integralId)
      docs.join(losers, Seq(idCol), "left_anti")
    else {
      // Spark's sketch BloomFilter hashes every integral type through
      // putLong, so probing with a long cast matches byte/short/int ids
      val bf = losers.stat.bloomFilter(idCol, math.max(nLosers, 1L), 0.01)
      val bfB = docs.sparkSession.sparkContext.broadcast(bf)
      val mightBeLoser = udf((id: java.lang.Long) =>
        id != null && bfB.value.mightContainLong(id))
      val maybe = mightBeLoser(col(idCol).cast("long"))
      docs.filter(maybe)
        .join(losers, Seq(idCol), "left_anti")
        .unionByName(docs.filter(!maybe))
    }
  }

  /** Apply near-dup clusters keeping the BEST document per component by a
    * caller-supplied quality score (ties broken by minimum id) instead of
    * [[applyClusters]]'s min-id keeper. Production pipelines keep the
    * longest / highest-quality member of a near-dup cluster (RefinedWeb,
    * Penedo et al. 2023 keeps by length) — the min-id rule is only the
    * right default when no quality signal exists.
    *
    * `score` is evaluated against `docs`' columns (e.g. `col("n_chars")`
    * or a classifier score column).
    *
    * Scale shape: the docs→labels decision join ships only (id, score) —
    * guide §8's slim-proxy rows — and broadcasts the label table below
    * `maxBroadcastLosers` (the pre-r18 unconditional broadcast hint would
    * OOM the driver once the clustered-doc table outgrows the broadcast
    * cap; above the guard the slim join shuffles 16-byte rows, never
    * documents); the argmax window runs on the slim scored label table
    * only; the final anti-join picks its strategy from the measured loser
    * count exactly like [[applyClusters]] ([[antiJoinLosers]]). */
  def applyClustersKeepBest(
      docs: DataFrame,
      clusters: DataFrame,
      score: Column,
      idCol: String = "doc_id",
      maxBroadcastLosers: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cSlim = clusters.select(col("id"), col("comp"))
    // one metadata-cheap count decides the whole shape: the label table
    // rides connectedComponents' own checkpoints, so counting it costs a
    // slim scan, not a pipeline re-run. losers ≤ clustered docs, so the
    // count bounds BOTH broadcast decisions at once — below the guard the
    // plan stays fully lazy (no materialization jobs; measured r18: an
    // eager loser checkpoint cost more than it saved at sf0.1)
    val nClustered = cSlim.count()
    val w = Window.partitionBy(col("comp"))
      .orderBy(col("__score").desc, col("id"))
    if (nClustered <= maxBroadcastLosers) {
      val scored = docs
        .select(col(idCol).as("id"), score.as("__score"))
        .join(broadcast(cSlim), Seq("id"))
      val losers = scored
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") > 1)
        .select(col("id").as(idCol))
      docs.join(broadcast(losers), Seq(idCol), "left_anti")
    } else {
      // above the broadcast cap the decision join ships only (id, score)
      // — guide §8's slim-proxy rows, never documents — and the loser
      // set is materialized once (its measured count picks broadcast vs
      // Bloom-pruned anti-join in antiJoinLosers)
      val scored = docs
        .select(col(idCol).as("id"), score.as("__score"))
        .join(cSlim, Seq("id"))
      val lObs = org.apache.spark.sql.Observation()
      val losers = scored
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") > 1)
        .select(col("id").as(idCol))
        .observe(lObs, count(lit(1)).as("n"))
        .localCheckpoint()
      val nLosers = lObs.get("n").asInstanceOf[Long]
      antiJoinLosers(docs, losers, nLosers, idCol, maxBroadcastLosers)
    }
  }

  /** ONE min-label-propagation round of [[connectedComponents]] as an
    * un-executed plan: edges join the label frame on src, a dst-keyed
    * partial-min aggregate produces each node's neighbor minimum, and a
    * left join folds it into `least(own, neighbor-min)` — only
    * (src, dst, comp) ever shuffles. Extracted so the loop and the
    * PLANS.md artifact share the SAME code path (the post-checkpoint
    * loop result plans as `Scan ExistingRDD` and pins nothing). */
  def ccRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val neighborMin = edges
      .join(labels.withColumnRenamed("id", "src"), Seq("src"))
      .groupBy(col("dst").as("id"))
      .agg(min(col("comp")).as("nmin"))
    labels.join(neighborMin, Seq("id"), "left")
      .select(col("id"),
        least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
  }

  /** Connected components over a candidate-pair set: near-dup PAIRS only
    * become deduplicatable once grouped into clusters (keep one doc per
    * component). Min-label propagation: every node repeatedly takes the
    * minimum label among itself and its neighbors until fixpoint — the
    * final label is the smallest id in the component, a deterministic
    * cluster key.
    *
    * Each iteration is one join + one partial-min aggregate; lineage is
    * truncated per iteration so the plan doesn't grow unboundedly.
    * Truncation is `localCheckpoint` by default (blocks on executors —
    * fine single-machine, lost with an executor on a cluster); pass
    * `checkpointDir` (HDFS/object-store path on a real cluster) to switch
    * every truncation to a RELIABLE `checkpoint`, making each iteration
    * durable against executor loss. Reliable checkpoint computes the
    * frame twice (once for the materializing action, once for the
    * checkpoint write job) — the per-iteration frames here are label
    * tables, orders of magnitude smaller than the corpus, so durability
    * costs little. Convergence takes O(component diameter) rounds;
    * near-dup components are near-cliques, so a handful. */
  def connectedComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 25,
      checkpointDir: Option[String] = None,
      maxDriverEdges: Long = 1000000L,
      maxBroadcastLabels: Long = 4000000L): DataFrame = {
    // id-type contract (VERDICT r15): both endpoints must share ONE
    // numeric id type — min/least give the component-minimum label, the
    // convergence metric sums labels as decimals, and the bounded driver
    // union-find compares collected ids via Comparable. A string or
    // mixed-type id column would break the decimal convergence sum
    // silently and the driver compare loudly, so fail fast here instead.
    Seq(idA, idB).foreach { c =>
      val dt = pairs.schema(c).dataType
      require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"connectedComponents ids must be numeric, got $c: ${dt.simpleString}" +
          " (hash or dictionary-encode string ids first)")
    }
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    // one lineage-truncation policy for the whole algorithm
    def snap(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint() else df.localCheckpoint()
    // both directions from ONE pass over pairs (a union would execute the
    // upstream candidate-pair pipeline twice).
    // Explicit scale-adaptive repartition before the distinct
    // (optimization r17, guide §2.5): edge rows are two longs, so AQE's
    // BYTE-based coalescing collapses the distinct — and every downstream
    // sort/aggregate reading the persisted frame — to one task long
    // before the ROW count stops mattering. A numbered repartition on the
    // distinct's own key is coalesce-exempt, adds no extra exchange
    // (the aggregate reuses it), and derives its count from the session's
    // parallelism, not a constant.
    val nPart = pairs.sparkSession.sparkContext.defaultParallelism
    val fullEdges = pairs
      .select(explode(array(
        struct(col(idA).as("src"), col(idB).as("dst")),
        struct(col(idB).as("src"), col(idA).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(nPart, col("src"), col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // labels only ever decrease, so Σcomp is strictly monotone until the
    // fixpoint — an O(1)-output aggregate per round replaces a join-based
    // change count. The aggregate rides the SAME job that materializes the
    // round's labels (`observe` + eager localCheckpoint): one pass per
    // round, no separate convergence scan.
    def sumComp(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0)

    // observe-riding metrics are only sound on the localCheckpoint path:
    // a RELIABLE Dataset.checkpoint() materializes the plan twice (the
    // eager action plus the checkpoint-write job), so a CollectMetrics
    // accumulator would aggregate both runs and report ~2x values
    // (ADVICE r17 — for the convergence sum that could even fake a
    // fixpoint). The reliable path reads its metrics from the
    // already-checkpointed frame instead: one extra cheap scan per
    // round, paid only when durability was asked for.
    val reliableSnap = checkpointDir.isDefined
    def propagate(edges: DataFrame, labels0: DataFrame, rounds: Int): DataFrame = {
      var labels = labels0
      var prevSum = sumComp(labels)
      var i = 0
      var converged = false
      while (!converged && i < rounds) {
        val s =
          if (reliableSnap) {
            labels = snap(ccRound(edges, labels))
            sumComp(labels)
          } else {
            val obs = org.apache.spark.sql.Observation()
            // eager snap: runs the job, publishing the observed metric
            labels = snap(ccRound(edges, labels)
              .observe(obs, sum(col("comp").cast("decimal(38,0)")).as("sumComp")))
            obs.get("sumComp").asInstanceOf[java.math.BigDecimal]
          }
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        i += 1
      }
      labels
    }

    // Round 1 over the full edge set, then CONTRACT: near-dup components
    // are near-cliques, so one round collapses most of the graph and the
    // contracted component graph is orders of magnitude smaller — the
    // remaining fixpoint iterations run on that. Contraction preserves
    // connectivity, and contracted node ids are first-round labels
    // (original ids), so the component minimum survives.
    // round 1 needs no join: with identity labels, the neighbor minimum
    // of a node is simply min(src) over its incoming edges.
    // repartition-by-dst feeds the aggregate its exact required
    // partitioning (one exchange, coalesce-exempt — see fullEdges note)
    // the node count rides the checkpoint's own materialization job
    // (observe — the same zero-extra-job pattern as the convergence sum;
    // on the reliable path it is a metadata-cheap count of the
    // checkpointed frame instead, see reliableSnap above)
    val labels1Base = fullEdges
      .repartition(nPart, col("dst"))
      .groupBy(col("dst").as("id"))
      .agg(min(col("src")).as("nmin"))
      .select(col("id"), least(col("id"), col("nmin")).as("comp"))
    val nNodesObs = org.apache.spark.sql.Observation()
    val labels1 =
      if (reliableSnap) snap(labels1Base)
      else snap(labels1Base.observe(nNodesObs, count(lit(1)).as("n")))
    // Broadcast tier for the contraction joins (optimization r17, guide
    // §3.1): labels1 is one slim (id, comp) row per node that appears in
    // a pair. localCheckpoint erases its statistics, so the planner falls
    // back to sort-merge — two shuffles plus sorts of the full edge set —
    // and AQE cannot re-plan a join whose inputs are RDD scans (no
    // shuffle stats to read). Below `maxBroadcastLabels` (default 4M
    // rows ≈ tens of MB framed — guide §3.1's "a few hundred MB is fine"
    // with headroom) an explicit broadcast hint turns both contraction
    // joins into map-side hash joins fused over the persisted edge
    // partitions: zero shuffles. The count is a metadata-cheap job on the
    // already-materialized checkpoint. Above the guard — a label table
    // that genuinely doesn't broadcast — the sort-merge path stands.
    val nNodes =
      if (reliableSnap) labels1.count()
      else nNodesObs.get("n").asInstanceOf[Long]
    val l1src = labels1.withColumnRenamed("id", "src")
      .withColumnRenamed("comp", "csrc")
    val l1dst = labels1.withColumnRenamed("id", "dst")
      .withColumnRenamed("comp", "cdst")
    val (jSrc, jDst) =
      if (nNodes <= maxBroadcastLabels) (broadcast(l1src), broadcast(l1dst))
      else (l1src, l1dst)
    // the contracted-edge count rides the checkpoint's materialization
    // job via observe (optimization r17 — the labels1 pattern; a
    // separate count() was one more job per CC call; reliable path:
    // count the checkpointed frame, see reliableSnap above)
    val contractedBase = fullEdges
      .join(jSrc, Seq("src"))
      .join(jDst, Seq("dst"))
      .select(col("csrc").as("src"), col("cdst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val cObs = org.apache.spark.sql.Observation()
    val contracted =
      if (reliableSnap) snap(contractedBase)
      else snap(contractedBase.observe(cObs, count(lit(1)).as("n")))
    fullEdges.unpersist()

    // After one contraction the component graph is usually orders of
    // magnitude smaller than the corpus. Below `maxDriverEdges` (~16 MB of
    // long pairs) the remaining fixpoint is FINISHED ON THE DRIVER with
    // union-find: each distributed iteration costs a full job (fixed
    // scheduling overhead dominates on a tiny graph), while driver-side
    // union-find on the collected edge list is microseconds, and the
    // result returns as one broadcast join. Above the guard — a graph
    // that genuinely doesn't fit a driver — the distributed min-label
    // loop runs as before. Both paths produce identical labels (the
    // component's minimum original id).
    val nEdges =
      if (reliableSnap) contracted.count()
      else cObs.get("n").asInstanceOf[Long]
    val resolved =
      if (nEdges == 0) labels1
      else if (nEdges <= maxDriverEdges) {
        import scala.collection.mutable
        val parent = mutable.Map.empty[Any, Any]
        val minOf = mutable.Map.empty[Any, Any]
        val seen = mutable.Set.empty[Any]
        def lt(a: Any, b: Any): Boolean =
          a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
        def find(x: Any): Any = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) {
            val next = parent(c); parent(c) = r; c = next
          }
          r
        }
        def union(a: Any, b: Any): Unit = {
          seen += a; seen += b
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            parent(rb) = ra
            val m = Seq(minOf.getOrElse(ra, ra), minOf.getOrElse(rb, rb))
              .reduce((x, y) => if (lt(x, y)) x else y)
            minOf(ra) = m
          }
        }
        contracted.collect().foreach(r => union(r.get(0), r.get(1)))
        val compType = labels1.schema("comp").dataType
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("comp", compType),
          org.apache.spark.sql.types.StructField("super", compType)))
        val rows = seen.map { k =>
          val r = find(k)
          org.apache.spark.sql.Row(k, minOf.getOrElse(r, r))
        }.toSeq
        val spark = pairs.sparkSession
        val superDf = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
        labels1
          .join(broadcast(superDf), Seq("comp"), "left")
          .select(col("id"), coalesce(col("super"), col("comp")).as("comp"))
      } else {
        val cInitial = snap(contracted.select(col("src").as("id")).distinct()
          .union(contracted.select(col("dst").as("id")).distinct())
          .distinct()
          .withColumn("comp", col("id")))
        val cLabels = propagate(contracted, cInitial, maxIter)
        // final label: node → round-1 comp → contracted-graph comp
        labels1
          .join(cLabels.withColumnRenamed("comp", "super")
            .withColumnRenamed("id", "comp"), Seq("comp"), "left")
          .select(col("id"), coalesce(col("super"), col("comp")).as("comp"))
      }
    resolved
  }

  /** Incremental (batch-vs-corpus) near-dup admission: given the full
    * document set, a predicate marking the INCOMING batch, and scored
    * candidate pairs over the union, admit only incoming documents with
    * no near-dup partner (`est_jaccard ≥ minJaccard`) among the EXISTING
    * documents. Incoming-vs-incoming duplicates are NOT dropped here —
    * that is [[applyClusters]]' job on the admitted batch; this operator
    * is the production admission gate that avoids re-deduplicating 100 TB
    * of corpus for every new shard.
    *
    * Scale shape: pairs are already banded/skew-guarded; classification
    * of pair sides is one semi-join against the existing-id set and the
    * admission is one anti-join — all keyed, nothing quadratic, the
    * corpus text never moves (only ids). */
  def incrementalFilter(
      docs: DataFrame,
      pairs: DataFrame,
      isNew: Column,
      minJaccard: Double = 0.5,
      idCol: String = "doc_id"): DataFrame = {
    val existing = docs.filter(!isNew).select(col(idCol).as("__other"))
    // each scored pair, seen from both sides: (self, other)
    val sides = pairs.filter(col("est_jaccard") >= minJaccard)
      .select(explode(array(
        struct(col("id_a").as("__self"), col("id_b").as("__other")),
        struct(col("id_b").as("__self"), col("id_a").as("__other")))).as("e"))
      .select(col("e.__self").as("__self"), col("e.__other").as("__other"))
    val blocked = sides.join(existing, Seq("__other"), "left_semi")
      .select(col("__self").as(idCol)).distinct()
    docs.filter(isNew).join(blocked, Seq(idCol), "left_anti")
  }

  /** Cross-document repeated-SUBSTRING spans — the ExactSubstr signal
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): a token n-gram occurring in ≥ `minDf` DISTINCT documents
    * marks a memorizable region, and overlapping/adjacent marked grams
    * merge into per-document spans `[span_start, span_end]` (token
    * positions, 1-based) a curation pass can excise. Catches the middle
    * ground line-dedup and whole-doc dedup both miss: multi-line license
    * blocks, quoted paragraphs, syndicated passages.
    *
    * Shape at scale: tokenize → position explode → gram slice (all
    * codegen projections) → one hash-agg keyed by gram for the distinct-
    * doc frequency → keyed equi-join back (inner, ≤1 match per row — no
    * fan-out; AQE's skew split handles whale grams) → per-document
    * ordered window for the span merge (never a global window). The
    * shuffles carry (gram) and (doc, pos) pairs, not documents. */
  def repeatedSubstringSpans(
      docs: DataFrame,
      gramN: Int = 8,
      minDf: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(gramN >= 2 && minDf >= 2, "gramN and minDf must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val grams = Fan.spread(docs
      .select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), T.tokens(col("__t")).as("toks"))
      .filter(size(col("toks")) >= gramN)
      .select(col("id"),
        explode(sequence(lit(1), size(col("toks")) - lit(gramN - 1))).as("p"),
        col("toks"))
      .select(col("id"), col("p"),
        concat_ws(" ", slice(col("toks"), col("p"), lit(gramN))).as("gram"))
    val repeated = grams.groupBy(col("gram"))
      .agg(count_distinct(col("id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("gram"))
    val hits = grams.join(repeated, Seq("gram")).select(col("id"), col("p"))
    // a hit opens a new span iff it doesn't overlap/touch the previous
    // gram's [prev, prev + gramN - 1] token window
    val w = Window.partitionBy(col("id")).orderBy(col("p"))
    hits
      .withColumn("ns",
        when(lag(col("p"), 1).over(w).isNull ||
          col("p") > lag(col("p"), 1).over(w) + gramN, 1).otherwise(0))
      .withColumn("span_id", sum(col("ns")).over(
        Window.partitionBy(col("id")).orderBy(col("p"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id").as(idCol), col("span_id"))
      .agg(
        min(col("p")).cast("bigint").as("span_start"),
        (max(col("p")) + lit(gramN - 1)).cast("bigint").as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col(idCol), col("span_id"), col("span_start"),
        col("span_end"), col("n_grams"))
  }

  /** EXACT cross-document repeated substrings of at least `minLen`
    * tokens — the full ExactSubstr discipline (Lee et al. §4.1: their
    * suffix array finds byte-exact repeats ≥ 50 tokens), where
    * [[repeatedSubstringSpans]] is the cheaper gram-df approximation.
    * The gram tier can MIS-MERGE: two different repeated grams that
    * happen to sit near each other in one document fuse into a span that
    * is not an exact repeat of anything. This tier only reports spans
    * that are verbatim-equal to a span in another document.
    *
    * The suffix-array idea re-expressed Spark-first: a repeat of length
    * L ≥ minLen between docs A and B covers L−gramN+1 CONSECUTIVE
    * matching gram positions at ONE constant alignment offset
    * (pa − pb). So: seed with gramN-grams occurring in ≥2 docs (the
    * cross-partition candidate step — a partition-local suffix array
    * would still need this to see repeats spanning partitions), equi-join
    * occurrences into cross-doc pairs, and group by (id_a, id_b, offset):
    * runs of consecutive pa are exact matches because every covering
    * gram window matches. Runs shorter than minLen−gramN+1 grams are
    * discarded, surviving runs project to per-doc spans, and overlapping
    * spans merge per doc (two partners' repeats can overlap).
    *
    * Scale shape: everything is keyed — gram census (partial-agg), pair
    * equi-join (repartitioned by gram, AQE-exempt), per-(pair, offset)
    * window, per-doc merge window. The pair join is quadratic per gram:
    * `maxGramDf` drops whale grams (df > cap) exactly like winnow's
    * `maxFpDf` — those grams are boilerplate that line-dedup owns. The
    * precise recall contract: a repeat survives iff it still contains a
    * run of ≥ minLen−gramN+1 CONSECUTIVE surviving gram positions, so an
    * interior whale gram splits the run and can push both halves below
    * minLen (a repeat barely over minLen with boilerplate in its middle
    * is lost, not just trimmed). Grams travel
    * as md5 (collision odds ~2⁻¹²⁸ — the standard ExactSubstr
    * hash-not-text trick to keep the shuffle slim). */
  def repeatedSubstringSpansExact(
      docs: DataFrame,
      minLen: Int = 20,
      gramN: Int = 8,
      maxGramDf: Int = 1000,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(minLen >= gramN, "minLen must be >= gramN")
    require(maxGramDf >= 2, "maxGramDf must be >= 2")
    import org.apache.spark.sql.expressions.Window
    // slim (g, id, p) occurrence stream; localCheckpoint for the same
    // reason as the LSH banded frame — two consumers (census + pair join)
    // whose exchanges differ, so the tokenize+gram pipeline would run twice
    val grams = Fan.spread(docs
      .select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), T.tokens(col("__t")).as("toks"))
      .filter(size(col("toks")) >= gramN)
      .select(col("id"),
        explode(sequence(lit(1), size(col("toks")) - lit(gramN - 1))).as("p"),
        col("toks"))
      .select(col("id"), col("p"),
        md5(concat_ws(" ", slice(col("toks"), col("p"), lit(gramN)))).as("g"))
      .localCheckpoint()
    val kept = grams.groupBy(col("g"))
      .agg(count_distinct(col("id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxGramDf)
      .select(col("g"))
    val nPart = docs.sparkSession.sparkContext.defaultParallelism
    val hits = grams.join(kept, Seq("g")).repartition(nPart, col("g"))
    val l = hits.select(col("g"), col("id").as("id_a"), col("p").as("pa"))
    val r = hits.select(col("g"), col("id").as("id_b"), col("p").as("pb"))
    val aligned = l.join(r, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), (col("pa") - col("pb")).as("off"),
        col("pa"))
      // duplicate grams WITHIN one doc can land the same (pair, off, pa)
      // row twice; the run window needs unique positions
      .distinct()
    val wRun = Window.partitionBy(col("id_a"), col("id_b"), col("off"))
      .orderBy(col("pa"))
    val runs = aligned
      .withColumn("ns", when(lag(col("pa"), 1).over(wRun).isNull ||
        col("pa") > lag(col("pa"), 1).over(wRun) + 1, 1).otherwise(0))
      .withColumn("run_id", sum(col("ns")).over(
        wRun.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id_a"), col("id_b"), col("off"), col("run_id"))
      .agg(min(col("pa")).as("sa"), max(col("pa")).as("ea"))
      .filter(col("ea") - col("sa") + lit(gramN) >= minLen)
    // each surviving run is an exact repeat in BOTH documents
    val sides = runs.select(explode(array(
        struct(col("id_a").as("id"), col("sa").as("s"),
          (col("ea") + lit(gramN - 1)).as("e")),
        struct(col("id_b").as("id"), (col("sa") - col("off")).as("s"),
          (col("ea") - col("off") + lit(gramN - 1)).as("e")))).as("x"))
      .select(col("x.id").as("id"), col("x.s").as("s"), col("x.e").as("e"))
      .distinct()
    // per-doc interval merge (overlapping or adjacent spans fuse)
    val wm = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    sides
      .withColumn("pe", max(col("e")).over(
        wm.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ns", when(col("pe").isNull || col("s") > col("pe") + 1, 1)
        .otherwise(0))
      .withColumn("span_id", sum(col("ns")).over(
        wm.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id").as(idCol), col("span_id"))
      .agg(min(col("s")).cast("bigint").as("span_start"),
        max(col("e")).cast("bigint").as("span_end"),
        count(lit(1)).cast("bigint").as("n_runs"))
  }

  /** Apply [[repeatedSubstringSpans]]: remove every token whose position
    * falls inside a span and reassemble the survivors in order — the
    * ExactSubstr EXCISION step (find → apply symmetry, like
    * [[applyClusters]] for cluster dedup). Documents with no spans
    * round-trip token-exact (whitespace is normalized by tokenization,
    * as in every token-level operator here).
    *
    * Scale shape: spans explode to their member positions
    * (`sequence(start, end)` — span width is bounded by document length,
    * so the explode is at worst one row per document token), then one
    * keyed ANTI-join on (doc, position) drops excised tokens, and a
    * per-doc sort_array(collect_list) reassembles. All shuffles keyed by
    * doc/position; no windows, no HOF filtering per row. A document whose
    * EVERY token is excised (or that had no tokens) has no surviving rows
    * and is dropped from the output — wall-to-wall repeated content is a
    * duplicate, and this IS its removal. */
  def exciseSpans(
      docs: DataFrame,
      spans: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(T.tokens(col(textCol))).as(Seq("p0", "tok")))
      .select(col(idCol), (col("p0") + 1).as("p"), col("tok")) // 1-based like spans
    val cut = spans.select(col(idCol),
      explode(sequence(col("span_start"), col("span_end"))).as("p"))
    toks.join(cut, Seq(idCol, "p"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok")), " ").as("clean_text"))
  }

  /** LINE-level boilerplate stripping — the dedup layer document-level
    * dedup misses: navigation headers, cookie banners, licence footers
    * repeat across pages without making whole documents duplicates
    * (CCNet / RefinedWeb-style line dedup). A line occurring in at least
    * `minDocs` DISTINCT documents is removed everywhere; survivors are
    * reassembled in original order.
    *
    * Shape at scale: posexplode → two-phase count-distinct keyed by the
    * line text → left-anti join → per-doc collect_list sorted by position.
    * Every shuffle is keyed (line / doc id); nothing global. The empty
    * string from consecutive separators is preserved (`split` limit -1)
    * so a document with no boilerplate round-trips byte-for-byte. */
  def stripBoilerplate(
      docs: DataFrame,
      minDocs: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(minDocs >= 2, "a line must repeat across documents to be boilerplate")
    val lines = Fan.spread(docs.select(col(idCol), col(textCol))).select(
      col(idCol), posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    // blank lines are document structure, not boilerplate — never removed
    val boiler = lines.filter(length(col("line")) > 0)
      .groupBy(col("line"))
      .agg(count_distinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select("line")
    val kept = lines.join(boiler, Seq("line"), "left_anti")
    val reassembled = kept.groupBy(col(idCol))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("clean_text"))
    docs.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Exact n-gram Jaccard similarity for OVERLAPPING pairs within a block
    * (same `blockCol` value). Pairs sharing no shingle are not emitted —
    * they are not dedup candidates, and materializing every within-block
    * pair with a 0.0 score IS the quadratic blow-up this operator exists
    * to avoid (at sf0.1 that is 622k scored pairs of which <10% overlap;
    * at 100 TB it is the job that never finishes).
    *
    * Sparse shape: explode each doc's distinct shingle set, equi-join on
    * (block, shingle), count matches per pair — |A∩B| from a keyed
    * shuffle with map-side partial counts, never a per-pair array
    * intersection, and the shingle arrays themselves never cross a
    * shuffle. Two skew guards, both mirrored by the oracle:
    *  - `maxBlockSize`: blocks with more docs are dropped whole (one
    *    crawl source dominating the corpus is the normal case);
    *  - `maxShingleDf`: shingles occurring in more docs of a block are
    *    dropped before the join (the classic stop-shingle guard — a
    *    boilerplate shingle shared by f docs contributes f² join rows). */
  def ngramJaccardPairs(
      docs: DataFrame,
      blockCol: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      maxBlockSize: Int = 1000,
      maxShingleDf: Int = 1000): DataFrame = {
    val keptBlocks = docs.groupBy(col(blockCol).as("block"))
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBlockSize)
      .select("block")
    // spread BEFORE tokenize+explode: the broadcast census join preserves
    // the (possibly single-partition) scan partitioning
    val capped = Fan.spread(docs
      .select(col(blockCol).as("block"), col(idCol).as("id"),
        col(textCol).as("__t")))
      .withColumn("toks", T.tokens(col("__t"))).drop("__t")
      .join(keptBlocks, Seq("block"))
    // shingle stream built explode-first with codegen'd slice/concat_ws —
    // NOT via wordShingles' `transform`, which is an interpreted HOF and
    // would dominate the runtime (same reasoning as minhashSignatures);
    // distinct() restores per-doc set semantics in one keyed shuffle whose
    // exchange every downstream consumer (census, sizes, both join sides)
    // then shares via ReuseExchange
    val ex = capped
      .select(col("block"), col("id"), col("toks"),
        explode(sequence(lit(1),
          greatest(size(col("toks")) - lit(shingleN - 1), lit(1)))).as("p"))
      .select(col("block"), col("id"),
        concat_ws(" ", slice(col("toks"), col("p"), lit(shingleN))).as("s"))
      .distinct()
    val sizes = ex.groupBy(col("block"), col("id"))
      .agg(count(lit(1)).as("_n"))
    val keptShingles = ex.groupBy("block", "s")
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxShingleDf)
      .select("block", "s")
    val exk = ex.join(keptShingles, Seq("block", "s"))
    val inter = exk.select(col("block"), col("s"), col("id").as("id_a"))
      .join(exk.select(col("block"), col("s"), col("id").as("id_b")), Seq("block", "s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("block", "id_a", "id_b")
      .agg(count(lit(1)).as("_int"))
    inter
      .join(sizes.select(col("block"), col("id").as("id_a"), col("_n").as("_na")),
        Seq("block", "id_a"))
      .join(sizes.select(col("block"), col("id").as("id_b"), col("_n").as("_nb")),
        Seq("block", "id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        (col("_int").cast("double") /
          greatest(col("_na") + col("_nb") - col("_int"), lit(1))).as("jaccard"))
  }

  /** EXACT set-similarity self-join by prefix filtering (AllPairs —
    * Bayardo, Ma & Srikant, WWW 2007; the MapReduce formulation is
    * Vernica, Carey & Li, SIGMOD 2010): every pair with shingle-set
    * Jaccard ≥ `threshold`, over the WHOLE corpus, with NO blocking key
    * and no recall loss — the third member of the candidate-generation
    * family (LSH buckets on hash collisions: probabilistic recall; SNM
    * bands on sort-key prefixes: locality assumption; prefix filtering
    * is the exact one).
    *
    * The filter: order the universe of set elements by ascending
    * document frequency (rarest first, ties by value — any consistent
    * total order works), sort each doc's set in that order, and take its
    * first `n − ⌈t·n⌉ + 1` elements as the PREFIX. Two sets with
    * Jaccard ≥ t must overlap within their prefixes (pigeonhole: a pair
    * disjoint on both prefixes can share at most the suffixes, which are
    * too short), so an equi-join on prefix elements finds every
    * qualifying pair. Rare-first ordering makes prefix join fan-out
    * tiny by construction; the additional LENGTH filter
    * (t·max(n_a,n_b) ≤ min(n_a,n_b), applied on the join output before
    * the pair dedup) discards size-incompatible candidates for free.
    *
    * Scale shape: one shingle explode + census (map-side partials), one
    * sorted-array build per doc (`array_sort(collect_list(struct))` —
    * row-bounded), one equi-join on prefix shingles, then verification
    * ships the two sorted arrays onto each SURVIVING candidate only
    * (candidates ≪ pairs is the algorithm's contract; at sf0.01 it is
    * 116 of 124,750 possible pairs at t=0.6). The one quadratic hazard
    * is an adversarial corpus where every doc shares one rare shingle —
    * `maxPrefixDf` drops prefix shingles above the cap (idle by default;
    * when it fires it trades in-whale recall for bounded work, the
    * [[minhashLsh]] `maxBucketSize` trade — and UNLIKE the idle case it
    * is then no longer exact).
    *
    * @return (id_a, id_b, n_a, n_b, n_inter, jaccard) for pairs with
    *         jaccard ≥ threshold, id_a < id_b */
  def prefixFilterJaccardPairs(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleN: Int = 3,
      threshold: Double = 0.6,
      maxPrefixDf: Int = 100000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold in (0,1]: $threshold")
    val nPart = docs.sparkSession.sparkContext.defaultParallelism
    // distinct shingle stream, explode-first with codegen'd
    // slice/concat_ws (the ngramJaccardPairs discipline — wordShingles'
    // `transform` is an interpreted HOF). Spread BEFORE tokenizing:
    // repartition is a plan barrier, so tokenize-then-spread would run
    // the split/lower pass fused onto the (often 1-partition) file scan.
    val ex = Fan.spread(docs
      .select(col(idCol).as("id"), col(textCol).as("__text")))
      .select(col("id"), T.tokens(col("__text")).as("toks"))
      .select(col("id"),
        explode(sequence(lit(1),
          greatest(size(col("toks")) - lit(shingleN - 1), lit(1)))).as("p"),
        col("toks"))
      .select(col("id"),
        concat_ws(" ", slice(col("toks"), col("p"), lit(shingleN))).as("s"))
      .distinct()
      .localCheckpoint(true) // 3 consumers: census, sorted arrays
    val dfc = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // per-doc set sorted rare-first (df asc, shingle asc). The numbered
    // repartition pins the aggregate's exchange at nPart: the (id,df,s)
    // stream is small in BYTES, so AQE's byte-based coalesce would
    // serialize the CPU-heavy collect+array_sort onto one task (5.2 s of
    // the query's 7 s at sf0.1); hash-on-id means the aggregate reuses
    // the exchange, and partial collect_list loses nothing map-side.
    // `toks` (rare-first) feeds the prefix stream; `vt` (the same distinct
    // set re-sorted in plain UTF8 order) feeds verification's merge-walk
    // intersect kernel — sorted once per DOC here instead of a hash-set
    // build per PAIR below (optimization r18, the C14/lsh_recall
    // discipline applied to the AllPairs verifier)
    val sorted = ex.join(dfc, Seq("s"))
      .repartition(nPart, col("id"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("st"))
      .select(col("id"),
        transform(col("st"), x => x.getField("s")).as("toks"),
        size(col("st")).cast("long").as("n"))
      .withColumn("vt", array_sort(col("toks")))
      .withColumn("p",
        (col("n") - ceil(lit(threshold) * col("n").cast("double")) + 1)
          .cast("int"))
      .localCheckpoint(true) // 2 consumers: prefix stream, verification
    val pre = sorted.select(col("id"), col("n"),
      explode(slice(col("toks"), lit(1), col("p"))).as("s"))
    // whale guard on prefix fan-out (idle ⇒ exact; firing ⇒ documented
    // recall trade)
    val keptPre = pre.groupBy(col("s"))
      .agg(count(lit(1)).as("__pdf"))
      .filter(col("__pdf") <= maxPrefixDf)
      .select(col("s"))
    // same AQE exemption on the self-join: the prefix stream is tiny in
    // bytes but the join multiplies rows per shingle, so a byte-based
    // coalesce serializes pair generation; both sides read the ONE
    // pinned exchange (the minhashLsh band-join discipline).
    val prek = pre.join(keptPre, Seq("s")).repartition(nPart, col("s"))
    val cand = prek.select(col("s"), col("id").as("id_a"), col("n").as("na"))
      .join(prek.select(col("s"), col("id").as("id_b"), col("n").as("nb")),
        Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("na"), col("nb")).cast("double") >=
        lit(threshold) * greatest(col("na"), col("nb")).cast("double"))
      .select(col("id_a"), col("id_b"))
      // pinned for the same reason: candidate pairs are tiny in bytes,
      // and the verification joins + array_intersect fuse onto this
      // aggregate's output — a byte-based coalesce runs them on 1 task
      .repartition(nPart, col("id_a"), col("id_b"))
      .distinct()
    // verification: arrays ship onto candidates only. The intersect
    // count is the allocation-free merge walk over the per-doc sorted
    // sets ([[org.apache.spark.sql.graft.SortedIntersectCount]]) —
    // identical to size(array_intersect) because the shingle sets are
    // distinct by construction; asDeterministic = false + the two-step
    // select keep it evaluated ONCE per pair (guide §4.4 — the threshold
    // filter would otherwise substitute the kernel into numerator and
    // denominator)
    cand
      .join(sorted.select(col("id").as("id_a"), col("vt").as("__va"),
        col("n").as("n_a")), Seq("id_a"))
      .join(sorted.select(col("id").as("id_b"), col("vt").as("__vb"),
        col("n").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        org.apache.spark.sql.graft.MinhashExpressionFunctions
          .sortedIntersectColumn(col("__va"), col("__vb"),
            asDeterministic = false)
          .cast("long").as("n_inter"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("jaccard"))
  }

  /** Sorted-neighborhood candidate pairs (Hernández & Stolfo 1995): sort
    * the corpus by a normalized key prefix, pair every record with its
    * `window − 1` successors in that order, verify candidates with exact
    * token-set Jaccard. The classic record-linkage complement to the
    * hash-bucket families: LSH/SimHash bucket on CONTENT OVERLAP, SNM
    * catches prefix-clustered near-dups (title variants, serial-numbered
    * boilerplate) with a candidate count that is |N|·(window−1) BY
    * CONSTRUCTION — no bucket-size distribution to guard.
    *
    * The global sort rank is computed with the banded two-pass pattern
    * ([[Curation.packSequences]]): band on a short prefix of the sort
    * key (monotone with key order), per-band partitioned `row_number`,
    * broadcast cumulative band offsets from a driver-bounded per-band
    * census — identical output to `Window.orderBy(key)` with no
    * single-partition stage. Sort skew is ENFORCED away, not just
    * documented: any band whose census count exceeds `maxBandSize` has
    * its prefix recursively extended one character at a time (every key
    * in a band shares the band prefix, so extension is order-preserving
    * and the refined bands partition exactly the same key range — the
    * OUTPUT IS UNCHANGED whether or not the guard fires, unlike the
    * drop/sub-split guards of the hash-bucket families). In English web
    * text the "th…" prefix alone is a double-digit share of documents,
    * so this is the normal case, not a corner. The one band that cannot
    * be split — more than `maxBandSize` records whose FULL `keyLen`
    * prefix is identical — stays whole (order among equal keys is by id
    * and no character can separate them); that is the exact-duplicate
    * whale, which the window then pairs as the near-dups they are.
    * Band census / offset bookkeeping on the driver compares strings as
    * UTF-8 bytes — the same binary collation Spark's UTF8String sort and
    * the SQL oracle use — never JVM UTF-16 code-unit order, which ranks
    * supplementary-plane characters below BMP U+E000–U+FFFF. Rows with a
    * NULL `textCol` carry no key and are excluded up front (documented
    * contract; a NULL key has no position in the sort order).
    * Pairing is one equi-join on rank buckets
    * (successor ranks land in the same or next bucket — the right side
    * probes both), then the ≤ window−1 distance filter; the Jaccard
    * verify is row-local set arithmetic on the carried token arrays.
    *
    * Reference surface: the reference's checksum-sorted duplicate scan
    * (sentinel-core store lookups order on md5) generalized to
    * similarity-windowed linkage.
    *
    * @return (id_a, id_b, rank_dist, jaccard) — id_a is the rank-lower
    *         record; jaccard = |A∩B| / |A∪B| over distinct lower-cased
    *         whitespace tokens, one IEEE division of exact ints
    */
  def sortedNeighborhood(
      docs: DataFrame,
      window: Int = 5,
      keyLen: Int = 24,
      bandLen: Int = 2,
      minJaccard: Double = 0.3,
      maxBandSize: Int = 100000,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(window >= 2 && window <= 1000, s"window out of range: $window")
    require(bandLen >= 1 && bandLen <= keyLen, "bandLen within key")
    require(maxBandSize >= 1, "maxBandSize must be positive")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    // sorted-distinct token sets: sorting ONCE per doc here lets the
    // verify below run the allocation-free merge-walk intersect kernel
    // per PAIR instead of building a hash set per pair (optimization
    // r18, the C14/lsh_recall discipline) — set size and intersection
    // COUNT are order-independent, so values are unchanged
    val keyed = Fan.spread(docs.filter(col(textCol).isNotNull))
      .select(col(idCol).as("id"),
        substring(T.normalizeText(col(textCol)), 1, keyLen).as("__key"),
        array_sort(array_distinct(T.tokens(col(textCol)))).as("__toks"))
      .localCheckpoint() // read by the census, the rank pass, and the join
    // Band census with recursive prefix extension: any over-full band is
    // re-censused at a LONGER prefix until every band fits (or its keys
    // are identical and nothing can split them). Each pass groups ONLY
    // the rows of the still-over-full bands (join on a driver-bounded
    // band frame), so refinement cost is proportional to the whale mass.
    // The extension length per band comes from an LCP JUMP, not one
    // character at a time: keys sort bytewise, so a band's min and max
    // key bound every key in it, and lcp(min, max) is the length every
    // key in the band agrees on — extending straight to lcp+1 is
    // guaranteed to split min from max. A 14-character shared prefix
    // costs one min/max agg + one census instead of 13 sequential
    // censuses (measured 2× on the shared-prefix stress corpus).
    // A band is (prefix, declaredLen): a key shorter than declaredLen is
    // its own whole prefix at that length, so the (string, len) pair —
    // not the string alone — is the unambiguous band identity.
    def lcpCodePoints(a: String, b: String): Int = {
      val x = a.codePoints().toArray
      val y = b.codePoints().toArray
      var i = 0
      while (i < x.length && i < y.length && x(i) == y(i)) i += 1
      i
    }
    var finalBands = Vector.empty[(String, Int, Long)] // (prefix, len, n)
    var pending: Seq[(String, Int, Long)] = keyed
      .groupBy(substring(col("__key"), 1, bandLen).as("__p"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), bandLen, r.getLong(1))).toSeq
    while (pending.nonEmpty) {
      val (over, fits) = pending.partition(_._3 > maxBandSize)
      finalBands ++= fits
      val next = Seq.newBuilder[(String, Int, Long)]
      over.groupBy(_._2).foreach { case (lvl, bands) =>
        val overDf = broadcast(bands.map(_._1).toDF("__op"))
        val bounds = keyed
          .join(overDf, substring(col("__key"), 1, lvl) === col("__op"))
          .groupBy(substring(col("__key"), 1, lvl).as("__p"))
          .agg(min(col("__key")).as("lo"), max(col("__key")).as("hi"))
          .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
          .toMap
        val byTarget = scala.collection.mutable.Map.empty[Int, List[String]]
        bands.foreach { case (p, _, n) =>
          val (lo, hi) = bounds(p)
          val target =
            if (lo == hi) lvl // identical keys: unsplittable whale
            else math.min(keyLen, lcpCodePoints(lo, hi) + 1)
          if (target <= lvl) finalBands :+= ((p, lvl, n))
          else byTarget.updateWith(target)(l => Some(p :: l.getOrElse(Nil)))
        }
        byTarget.foreach { case (target, ps) =>
          val pdf = broadcast(ps.toDF("__op"))
          next ++= keyed
            .join(pdf, substring(col("__key"), 1, lvl) === col("__op"))
            .groupBy(substring(col("__key"), 1, target).as("__p"))
            .agg(count(lit(1)).as("n"))
            .collect().map(r => (r.getString(0), target, r.getLong(1)))
        }
      }
      pending = next.result()
    }
    // Offsets in the engine's own collation: UTF-8 byte order (Spark's
    // UTF8String binary comparison), NOT JVM UTF-16 code-unit order.
    implicit val utf8Order: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      var c = 0
      while (c == 0 && i < x.length && i < y.length) {
        c = (x(i) & 0xff) - (y(i) & 0xff)
        i += 1
      }
      if (c != 0) c else x.length - y.length
    }
    // prefix-free over each key's candidate set, so byte order on the
    // prefix strings is exactly the global key order across bands
    val sorted = finalBands.sortBy(_._1)
    var acc = 0L
    val offsets = sorted.map { case (p, l, n) => val row = (p, l, acc); acc += n; row }
    val offsetsDf = offsets.toDF("__band", "__blen", "__offset")
    // each key matches exactly one (prefix, len) band: explode the key's
    // prefix at every band length in play, equi-join on (prefix, len)
    val lens = // empty corpus: keep one length so array() stays typed
      if (offsets.isEmpty) Seq(bandLen) else offsets.map(_._2).distinct.sorted
    val cands = keyed.select(col("id"), col("__key"), col("__toks"),
      explode(array(lens.map(l =>
        struct(substring(col("__key"), 1, l).as("__band"),
          lit(l).as("__blen"))): _*)).as("__c"))
      .select(col("id"), col("__key"), col("__toks"),
        col("__c.__band").as("__band"), col("__c.__blen").as("__blen"))
    val rankW = Window.partitionBy(col("__band"), col("__blen"))
      .orderBy(col("__key"), col("id"))
    val ranked = cands
      .join(broadcast(offsetsDf), Seq("__band", "__blen"))
      .withColumn("__rk", col("__offset") + row_number().over(rankW))
      .select(col("id"), col("__toks"), col("__rk"))
    val dMax = (window - 1).toLong
    val left = ranked.withColumn("__bk", expr(s"(__rk - 1) div $dMax"))
    // each successor rank falls in the same bucket or the one before its
    // own — probe both from the right side, one equi-join total
    val right = ranked
      .withColumn("__bk", explode(array(
        expr(s"(__rk - 1) div $dMax"), expr(s"(__rk - 1) div $dMax - 1"))))
    // merge-walk intersect count over the per-doc sorted sets — the old
    // size(array_intersect) appeared in BOTH the numerator and the union
    // term and was substituted again into the pushed-down threshold
    // filter (4 hash-set builds per pair); asDeterministic = false + the
    // two-step select pin it to ONE evaluation (guide §4.4)
    left.select(col("__bk"), col("id").as("id_a"),
        col("__toks").as("__ta"), col("__rk").as("__ra"))
      .join(right.select(col("__bk"), col("id").as("id_b"),
        col("__toks").as("__tb"), col("__rk").as("__rb")), Seq("__bk"))
      .filter(col("__rb") > col("__ra") && col("__rb") <= col("__ra") + dMax)
      .select(col("id_a"), col("id_b"),
        (col("__rb") - col("__ra")).as("rank_dist"),
        org.apache.spark.sql.graft.MinhashExpressionFunctions
          .sortedIntersectColumn(col("__ta"), col("__tb"),
            asDeterministic = false).as("__in"),
        size(col("__ta")).as("__na"), size(col("__tb")).as("__nb"))
      .select(col("id_a"), col("id_b"), col("rank_dist"),
        (col("__in").cast("double") /
          greatest(col("__na") + col("__nb") - col("__in"), lit(1))
            .cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Winnowing-fingerprint candidate pairs (the MOSS detector's join
    * step): documents sharing at least `minShared` winnowed fingerprints
    * ([[org.apache.spark.sql.graft.WinnowFingerprints]], k-gram window
    * sketch with the match-length guarantee) are near-dup/overlap
    * candidates. Complements the MinHash tier: winnowing keys on LOCAL
    * verbatim runs (k+w−1 chars), so it surfaces partial-copy/quotation
    * overlap that whole-document MinHash dilutes away.
    *
    * Scale shape: fingerprint selection is row-local (native expression,
    * no shuffle); only the slim (id, fp) pairs shuffle; `maxFpDf` drops
    * boilerplate fingerprints BEFORE the self-join (the same whale guard
    * as [[ngramJaccardPairs]]'s `maxShingleDf` — per-fp join fan-out is
    * bounded by maxFpDf²); the pair aggregation is one keyed shuffle. */
  def winnowPairs(
      docs: DataFrame,
      k: Int = 5,
      w: Int = 4,
      minShared: Long = 20,
      maxFpDf: Int = 100,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    pairsFromFps(keptWinnowFps(docs, k, w, maxFpDf, textCol, idCol), minShared)
  }

  /** Candidate pairs from a (id, fp) fingerprint stream: self-join on fp,
    * ordered ids, shared-count threshold — the one topology both winnow
    * tiers use (a drift between them would make the MOSS pair and
    * containment views disagree). */
  private def pairsFromFps(fk: DataFrame, minShared: Long): DataFrame =
    fk.select(col("fp"), col("id").as("id_a"))
      .join(fk.select(col("fp"), col("id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** Df-capped per-doc winnowed fingerprint set (id, fp) — the shared
    * first stage of [[winnowPairs]] and [[winnowContainment]]. */
  private def keptWinnowFps(
      docs: DataFrame, k: Int, w: Int, maxFpDf: Int,
      textCol: String, idCol: String): DataFrame = {
    val fps = Fan.spread(docs
        .filter(length(col(textCol)) >= k)
        .select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"),
        explode(org.apache.spark.sql.graft.TextExpressionFunctions
          .winnowColumn(col("__t"), k, w)).as("__w"))
      .select(col("id"), col("__w.fp").as("fp"))
      .distinct()
    val keptFps = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxFpDf)
      .select("fp")
    fps.join(keptFps, Seq("fp"))
  }

  /** Asymmetric containment from the winnow sketch: for each candidate
    * pair, `n_shared / n_a` and `n_shared / n_b` over the df-capped
    * fingerprint sets — the "doc A is mostly a copy of part of B" signal
    * (Broder's containment, estimated on local fingerprints), which the
    * symmetric Jaccard/minhash tier under-reports for containments of a
    * small doc in a large one. Same join topology as [[winnowPairs]]
    * plus two broadcast-size joins against per-doc fingerprint counts. */
  def winnowContainment(
      docs: DataFrame,
      k: Int = 5,
      w: Int = 4,
      minShared: Long = 20,
      maxFpDf: Int = 100,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val fk = keptWinnowFps(docs, k, w, maxFpDf, textCol, idCol)
    val sizes = fk.groupBy(col("id")).agg(count(lit(1)).as("_n"))
    pairsFromFps(fk, minShared)
      .join(sizes.select(col("id").as("id_a"), col("_n").as("_na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("_n").as("_nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        (col("n_shared").cast("double") / col("_na")).as("contain_a"),
        (col("n_shared").cast("double") / col("_nb")).as("contain_b"))
  }

  /** Deterministic random hyperplanes for sign-LSH over embeddings:
    * `nPlanes` vectors of dimension `dim`, seeded — the same plane set can
    * be regenerated anywhere (including inside an oracle query). */
  def lshPlanes(dim: Int, nPlanes: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign-LSH bucket key for an embedding column: bit p = sign of the dot
    * product with hyperplane p. Vectors in the same bucket are near-dup
    * candidates — the label-free blocking scheme for [[embeddingNearDup]]
    * when no natural block column exists. Pure per-row expression (native
    * codegen'd dot), zero shuffle to assign. */
  def lshBucket(vec: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(V.dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding near-dup via sign-LSH blocking: bucket on `nPlanes` random
    * hyperplane signs, then exact cosine within buckets. The quadratic
    * term shrinks by ~2^nPlanes for random data; recall is tunable via
    * nPlanes (fewer planes = bigger buckets = higher recall). */
  def embeddingNearDupLsh(
      vecs: DataFrame,
      threshold: Double,
      nPlanes: Int = 8,
      seed: Long = 7L,
      dim: Int = 64,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxBucketSize: Int = 100000): DataFrame =
    embeddingNearDup(
      vecs.withColumn("__bucket", lshBucket(col(vecCol), lshPlanes(dim, nPlanes, seed))),
      "__bucket", threshold, vecCol, idCol, maxBucketSize)
      .withColumnRenamed("block", "bucket")

  /** MULTI-PROBE sign-LSH near-dup — recall without bigger buckets: a
    * near-identical pair can still straddle a hyperplane (one low-margin
    * sign bit differs), and the single-probe variant's only fix is fewer
    * planes ⇒ quadratically bigger buckets. Standard multi-probe instead
    * ALSO probes the buckets at the vector's lowest-|margin| bit flips
    * (margin = the dot product the sign came from — the planes the vector
    * sits closest to, exactly the bits most likely to disagree between
    * near-dups). Candidates are (primary bucket of one side) ×
    * (any probe of the other): `nProbe − 1` extra slim probe rows per
    * vector, NOT a bucket-size blow-up — probe volume scales linearly in
    * nProbe while halving planes would square the per-bucket quadratic.
    *
    * Same guard story as [[embeddingNearDup]] (probes sub-split per
    * bucket); pairs found via several probes dedupe exactly because
    * cosine is IEEE-commutative. Output: (id_a, id_b, cosine), id_a <
    * id_b. nProbe = 1 reduces to [[embeddingNearDupLsh]]'s pair set. */
  def embeddingNearDupLshMultiProbe(
      vecs: DataFrame,
      threshold: Double,
      nPlanes: Int = 8,
      nProbe: Int = 2,
      seed: Long = 7L,
      dim: Int = 64,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxBucketSize: Int = 100000): DataFrame = {
    require(nProbe >= 1 && nProbe <= nPlanes, "nProbe must be in [1, nPlanes]")
    val planes = lshPlanes(dim, nPlanes, seed)
    // (|margin|, bit mask) per plane, sorted ascending — the flip order
    val cand = array_sort(array(planes.zipWithIndex.map { case (p, i) =>
      struct(abs(V.dot(col("v"), typedLit(p))).as("m"), lit(1L << i).as("mask"))
    }: _*))
    val base = Fan.spread(vecs.select(col(idCol).as("id"), col(vecCol).as("v")))
      .select(col("id"), col("v"),
        lshBucket(col("v"), planes).as("__b0"), cand.as("__cand"))
    val probes = base.select(col("id"), col("v"),
      explode(concat(
        array(struct(col("__b0").as("bucket"), lit(true).as("primary"))),
        transform(slice(col("__cand"), 1, nProbe - 1),
          x => struct(col("__b0").bitwiseXOR(x.getField("mask")).as("bucket"),
            lit(false).as("primary"))))).as("pr"))
      .select(col("id"), col("v"),
        col("pr.bucket").as("bucket"), col("pr.primary").as("primary"))
    // census over PRIMARY rows only: the split decision must not depend
    // on nProbe, or probing more could shed pairs probing less finds
    val guarded = Guards.subSplitBy(probes, "bucket", "id", maxBucketSize,
      col("primary"))
    val l = guarded.filter(col("primary"))
      .select(col("bucket"), col("__sub"), col("id").as("id_l"), col("v").as("v_l"))
    val r = guarded
      .select(col("bucket"), col("__sub"), col("id").as("id_r"), col("v").as("v_r"))
    l.join(r, Seq("bucket", "__sub"))
      .filter(col("id_l") =!= col("id_r"))
      .select(
        least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        V.cosine(col("v_l"), col("v_r")).as("cosine"))
      .filter(col("cosine") > threshold)
      .distinct()
  }

  /** Embedding near-dup pairs: cosine over pairs blocked by `blockCol`
    * (e.g. a cluster/label/LSH-bucket column) above a threshold.
    *
    * `maxBlockSize` enforces the bounded-block contract the caller's
    * blocking is supposed to provide ([[Guards.subSplit]]): a whale block
    * is hash-split and pairs are generated within sub-blocks only —
    * bit-identical results until a block exceeds the cap, bounded work
    * (at ~1/nSub in-whale recall) past it. */
  def embeddingNearDup(
      vecs: DataFrame,
      blockCol: String,
      threshold: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxBlockSize: Int = 100000): DataFrame = {
    val v = Guards.subSplit(
      Fan.spread(
        vecs.select(col(blockCol).as("block"), col(idCol).as("id"), col(vecCol).as("v"))),
      "block", "id", maxBlockSize)
    val l = v.select(col("block"), col("__sub"), col("id").as("id_a"), col("v").as("v_a"))
    val r = v.select(col("block"), col("__sub"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("block", "__sub"))
      .filter(col("id_a") < col("id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        V.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") > threshold)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    * every vector to its nearest anchor cell — a zero-shuffle per-row
    * projection ([[Similarity.cellOf]], anchors ride in the expression
    * like a broadcast variable) — then within each cell mark as a
    * duplicate any vector that has a SMALLER-id neighbor at cosine >=
    * `threshold`. Returns every input row with its cell and a `kept`
    * verdict, so the caller can either drop duplicates or audit them.
    *
    * The quadratic term is per-cell (the SemDeDup trick: k-means first,
    * compare only inside clusters), the same bounded-block contract as
    * [[embeddingNearDup]]; the anchor set must satisfy the IVF contract
    * (cells ≪ corpus). The loser set is keyed by id only — the wide
    * vectors never travel through the final join. */
  def semanticDedup(
      vecs: DataFrame,
      anchors: DataFrame,
      threshold: Double): DataFrame =
    semanticDedup(vecs, anchors, threshold, "embedding", "vec_id")

  // (defaults live on the Seq overload only — Scala forbids default args
  // on more than one alternative of an overloaded method)
  def semanticDedup(
      vecs: DataFrame,
      anchors: DataFrame,
      threshold: Double,
      vecCol: String,
      idCol: String): DataFrame = {
    val anchorSeq = anchors
      .select(col(idCol).cast("bigint"), col(vecCol)).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    semanticDedup(vecs, anchorSeq, threshold, vecCol, idCol)
  }

  /** [[semanticDedup]] with the keep-BEST prune instead of keep-smallest-
    * id: a vector is marked a duplicate when a same-cell neighbor at
    * cosine >= `threshold` BEATS it on `scoreCol` (strictly higher
    * score, ties to the smaller id) — the [[applyClustersKeepBest]]
    * rule (RefinedWeb keeps the longest member; SemDeDup's published
    * form keeps an arbitrary cluster representative, which production
    * pipelines replace with the quality argmax). Dominance is pairwise,
    * matching [[semanticDedup]]'s discipline: a loser can itself
    * eliminate a worse vector it dominates — the kept set is the
    * per-neighborhood quality frontier, not one survivor per connected
    * component (that stricter form is [[connectedComponents]] +
    * [[applyClustersKeepBest]] over these pairs).
    *
    * NULL scores sort BELOW every real score: a NULL-scored member
    * loses to any scored neighbor, and an all-NULL pair falls back to
    * the min-id rule — the explicit three-way branch below, because the
    * naive `q_a >= q_b` comparison is NULL (not false) on a one-sided
    * NULL and would silently route the WRONG member to the loser set.
    * Each unordered pair is joined ONCE (id_a < id_b) and emits its
    * loser by the dominance rule — same bounded per-cell quadratic,
    * same subSplit whale guard, same slim id-only loser set as
    * [[semanticDedup]].
    *
    * @return every input row as (idCol, cell, kept) */
  def semanticDedupKeepBest(
      vecs: DataFrame,
      anchors: Seq[(Long, Seq[Float])],
      threshold: Double,
      scoreCol: String,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxCellSize: Int = 100000): DataFrame = {
    val assigned = Guards.subSplit(
      Fan.spread(vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
        col(scoreCol).as("__q")))
        .withColumn("cell", Similarity.cellOf(anchors, col("v"))),
      "cell", "id", maxCellSize)
    val l = assigned.select(col("cell"), col("__sub"),
      col("id").as("id_a"), col("v").as("v_a"), col("__q").as("q_a"))
    val r = assigned.select(col("cell"), col("__sub"),
      col("id").as("id_b"), col("v").as("v_b"), col("__q").as("q_b"))
    // a (with the smaller id) wins ties; NULL scores lose to any real
    // score and tie against each other (min-id again)
    val aWins = when(col("q_a").isNull && col("q_b").isNull, lit(true))
      .when(col("q_a").isNull, lit(false))
      .when(col("q_b").isNull, lit(true))
      .otherwise(col("q_a") >= col("q_b"))
    val losers = l.join(r, Seq("cell", "__sub"))
      .filter(col("id_a") < col("id_b") &&
        V.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(when(aWins, col("id_b")).otherwise(col("id_a")).as("__loser"))
      .distinct()
    assigned
      .join(losers, assigned("id") === losers("__loser"), "left")
      .select(col("id").as(idCol), col("cell"), col("__loser").isNull.as("kept"))
  }

  /** [[semanticDedup]] at the sign-LSH tier — the 100 TB path: the cell
    * is [[lshBucket]] (O(nPlanes·dim) per row, no anchor broadcast, and
    * the bucket count scales with the corpus where a centroid budget is
    * fixed), followed by the same within-bucket keep-smallest-id prune.
    * Same [[Guards.subSplit]] whale guard, same `cosine >= threshold`
    * pair rule, same slim id-only loser set. Returns every input row as
    * (idCol, bucket, kept) — [[semanticDedup]]'s contract with the
    * bucket standing in for the cell.
    *
    * Trade vs the centroid tier: buckets are data-independent (no
    * training pass, no persisted anchors to version) and assignment is
    * cheaper, but near-dup pairs straddling a low-margin hyperplane are
    * missed (recall knob = fewer planes or
    * [[embeddingNearDupLshMultiProbe]]'s probes). At 2M vectors the
    * planted-family stress row recovers 100% because identical vectors
    * share every plane sign by construction. */
  def semanticDedupLsh(
      vecs: DataFrame,
      threshold: Double,
      nPlanes: Int = 8,
      seed: Long = 7L,
      dim: Int = 64,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxBucketSize: Int = 100000): DataFrame = {
    val planes = lshPlanes(dim, nPlanes, seed)
    val assigned = Guards.subSplit(
      Fan.spread(vecs.select(col(idCol).as("id"), col(vecCol).as("v")))
        .withColumn("bucket", lshBucket(col("v"), planes)),
      "bucket", "id", maxBucketSize)
    val l = assigned.select(col("bucket"), col("__sub"),
      col("id").as("id_a"), col("v").as("v_a"))
    val r = assigned.select(col("bucket"), col("__sub"),
      col("id").as("id_b"), col("v").as("v_b"))
    val losers = l.join(r, Seq("bucket", "__sub"))
      .filter(col("id_a") < col("id_b") &&
        V.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("__loser")).distinct()
    assigned
      .join(losers, assigned("id") === losers("__loser"), "left")
      .select(col("id").as(idCol), col("bucket"),
        col("__loser").isNull.as("kept"))
  }

  /** Incremental SEMANTIC admission — [[incrementalFilter]]'s sibling
    * for the embedding tier, over PERSISTED anchors: each incoming
    * vector is assigned to its cell (the zero-shuffle [[Similarity
    * .cellOf]] projection, using the SAME anchor set the corpus was
    * deduplicated with — [[graft.store.AnnArtifacts]] persists it; a
    * re-derived anchor set would assign different cells and silently
    * change the admission decision), and is admitted iff no same-cell
    * CORPUS SURVIVOR sits at `cosine >= threshold`.
    *
    * Contract, mirroring [[incrementalFilter]] exactly:
    *  - incoming-vs-incoming duplicates are NOT dropped here — that is
    *    [[semanticDedup]]'s job on the admitted batch;
    *  - corpus survivors are NEVER retroactively evicted — a new
    *    higher-quality near-dup does not displace the member already
    *    admitted. The gate avoids re-deduplicating 100 TB of corpus
    *    for every new shard: only the slim (id, vector, cell) survivor
    *    frame is read, and only cells the batch actually touches do
    *    any pair work.
    *
    * Scale shape: both sides assign cells per-row (no shuffle), the
    * only shuffle is the per-cell equi-join; a whale cell hash-splits
    * via [[Guards.subSplitBy]] with the census on the SURVIVOR side
    * (split must not depend on batch size), trading ~1/nSub in-whale
    * admission recall for bounded work — the [[semanticDedup]] trade.
    *
    * @return every incoming row as (idCol, cell, admitted) */
  def semanticIncrementalFilter(
      incoming: DataFrame,
      survivors: DataFrame,
      anchors: Seq[(Long, Seq[Float])],
      threshold: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxCellSize: Int = 100000): DataFrame = {
    val inc = Fan.spread(
      incoming.select(col(idCol).as("id"), col(vecCol).as("v")))
      .withColumn("cell", Similarity.cellOf(anchors, col("v")))
      .withColumn("__sur", lit(false))
    val sur = Fan.spread(
      survivors.select(col(idCol).as("id"), col(vecCol).as("v")))
      .withColumn("cell", Similarity.cellOf(anchors, col("v")))
      .withColumn("__sur", lit(true))
    val both = Guards.subSplitBy(inc.unionByName(sur), "cell", "id",
      maxCellSize, col("__sur"))
    val blocked = both.filter(!col("__sur"))
      .select(col("cell"), col("__sub"), col("id"), col("v"))
      .join(both.filter(col("__sur"))
        .select(col("cell"), col("__sub"), col("v").as("sv")),
        Seq("cell", "__sub"))
      .filter(V.cosine(col("v"), col("sv")) >= threshold)
      .select(col("id").as("__blocked")).distinct()
    inc.join(blocked, inc("id") === blocked("__blocked"), "left")
      .select(col("id").as(idCol), col("cell"),
        col("__blocked").isNull.as("admitted"))
  }

  def semanticDedup(
      vecs: DataFrame,
      anchors: Seq[(Long, Seq[Float])],
      threshold: Double,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxCellSize: Int = 100000): DataFrame = {
    // subSplit (same guard as knnGraph): a whale cell compares within its
    // hash-split sub-cells only — conservative (fewer losers found) but
    // bounded; identical results while every cell fits the cap
    val assigned = Guards.subSplit(
      Fan.spread(vecs.select(col(idCol).as("id"), col(vecCol).as("v")))
        .withColumn("cell", Similarity.cellOf(anchors, col("v"))),
      "cell", "id", maxCellSize)
    val l = assigned.select(col("cell"), col("__sub"), col("id").as("id_a"), col("v").as("v_a"))
    val r = assigned.select(col("cell"), col("__sub"), col("id").as("id_b"), col("v").as("v_b"))
    val losers = l.join(r, Seq("cell", "__sub"))
      .filter(col("id_a") < col("id_b") &&
        V.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("__loser")).distinct()
    assigned
      .join(losers, assigned("id") === losers("__loser"), "left")
      .select(col("id").as(idCol), col("cell"), col("__loser").isNull.as("kept"))
  }
}
