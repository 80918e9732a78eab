package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames the other operators produce (the kNN
  * graph, the dedup pair graphs). Connected components lives with its
  * consumer in [[Dedup.connectedComponents]]; this module holds the
  * rank/centrality side.
  */
object Graphs {

  /** Both edge directions from ONE pass over the input (optimization
    * r17, guide §2.4 — the [[Dedup.connectedComponents]] discipline):
    * `edges.unionByName(edges.reversed)` evaluates the upstream edge
    * BUILD twice — for the kNN-graph consumers that is the whole
    * cell-blocked scoring pipeline, the dominant cost of every graph
    * query — while one explode of a two-struct array reads it once.
    * Emits exactly the union's row multiset (callers `distinct`/filter
    * as before), so every consumer's result is unchanged. */
  private def bothDirections(edges: DataFrame): DataFrame =
    edges.select(explode(array(
      struct(col("src"), col("dst")),
      struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Fixed-iteration PageRank (Page et al. 1999) in EXACT integer
    * arithmetic: ranks are parts-per-million BIGINTs, each iteration is
    *
    *   r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100
    *
    * i.e. damping 0.85 with the textbook per-node (1−d) base, divisions
    * truncating — a DEFINED deterministic semantics (no FP summation
    * order to pin), so the whole computation replays in any SQL engine
    * as chained CTEs and the driver's hash compare holds bit-for-bit.
    * Dangling mass is dropped, not redistributed (documented divergence
    * from the redistribute-to-all-nodes variant; with top-k out-edges per
    * node, as in the kNN graph, dangling nodes are rare by construction).
    *
    * Scale shape: the slim (src, dst) edge frame and its out-degree table
    * are eagerly localCheckpoint-ed ONCE (the minhashLsh policy — without
    * it every iteration would re-run the whole upstream graph build, a
    * kNN self-join here), then each iteration is one src-keyed join to
    * the N-row rank frame plus one dst-keyed sum — two shuffles of
    * (edge count + node count) slim rows per iteration, nothing
    * quadratic, no driver-side state. `iters` is fixed and small (3–10):
    * rank frames stay lineage-shallow, so no per-iteration checkpoint is
    * needed.
    *
    * Reference surface: generalizes the reference's per-run aggregation
    * statistics (sentinel-core processors/stats) to graph centrality —
    * the corpus-curation use is scoring documents by how central they sit
    * in the near-duplicate / semantic-neighbor graph.
    *
    * @param edges (src, dst) directed edge frame
    * @param nodes one-column (id) frame enumerating ALL nodes (isolated
    *              nodes keep the base rank 150000)
    * @return (id, rank_ppm) — Σ rank_ppm ≈ 10^6 · |nodes| minus truncated
    *         and dangling mass
    */
  /** Synchronous label propagation (Raghavan et al. 2007) with a
    * DETERMINISTIC update rule: each iteration every node adopts the MOST
    * FREQUENT label among its in-neighbors, ties broken by smallest
    * label, isolated nodes keeping their own — the cheap community
    * detector for the near-duplicate / semantic-neighbor graph (coarser
    * than connected components, which union everything touching; LPA
    * splits a chain of weak bridges into dense cores).
    *
    * Classic LPA is nondeterministic (random visit order, random ties);
    * this variant is synchronous with a total tie order, so a fixed
    * iteration count yields ONE defined answer that replays as unrolled
    * SQL CTEs — the pageRank discipline. Labels are node ids (bigints);
    * the mode is a count aggregation + one windowed argmax — exact
    * integer semantics, nothing FP anywhere.
    *
    * Scale shape: the symmetrized edge frame is localCheckpoint-ed once;
    * each iteration is one src-keyed join to the node-scale label frame,
    * one (dst, label)-keyed count, one dst-partitioned window top-1, and
    * a left join back to nodes — all slim frames, shuffles keyed by node
    * id, no quadratic anywhere. `iters` is fixed and small, so lineage
    * stays shallow.
    *
    * @param edges directed (src, dst) frame — symmetrized internally so
    *              neighbor influence flows both ways
    * @param nodes one-column (id) frame enumerating ALL nodes
    */
  def labelPropagation(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 0 && iters <= 50, s"iters out of range: $iters")
    val e = bothDirections(edges)
      .distinct()
      .localCheckpoint()
    val n = nodes.select(col("id"))
    var labels = n.select(col("id"), col("id").as("label"))
    for (_ <- 0 until iters) {
      val counts = e
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("c"))
      val pick = counts
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("dst"))
            .orderBy(col("c").desc, col("label").asc)))
        .filter(col("__rn") === 1)
        .select(col("dst").as("id"), col("label").as("__new"))
      // `labels` is referenced twice per iteration (the neighbor join and
      // the keep-own fallback), so lineage doubles each round — truncate
      // it; the frame is node-scale and the checkpoint is one slim job
      labels = labels.join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels.withColumnRenamed("label", "community")
  }

  /** Per-community structure report over [[labelPropagation]]'s
    * communities: size, internal undirected edge count, degree mass, and
    * the community's Newman modularity term
    *
    *   Q_c = e_c / m − (d_c / 2m)²
    *
    * (Σ_c Q_c is the partition's modularity — emitted per community, one
    * IEEE expression over exact integer aggregates per ROW, so the
    * driver's hash compare never sees a cross-row double sum). The
    * quality gate for the community detector itself: near-zero terms
    * mean the "community" is no denser than chance, which in the
    * near-duplicate graph separates real template families from
    * accidental agglomerations.
    *
    * Scale shape: everything after the LPA labels is keyed aggregation
    * on the slim symmetrized edge frame — degree per node, one
    * label-join per endpoint for internal-edge counts, and a broadcast
    * 1-row edge total; nothing quadratic, the modularity arithmetic runs
    * on the |communities|-row frame.
    *
    * @return (community, n_nodes, internal_edges, degree_sum,
    *         modularity_term) */
  def communityStats(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int = 3): DataFrame = {
    // ONE materialization of the (typically expensive — kNN build) edge
    // frame feeds BOTH the LPA loop and the structural census below;
    // previously each re-executed the full upstream build (guide §5)
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint()
    val labels = labelPropagation(e0, nodes, iters)
    val und = bothDirections(e0)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // read by the half-edge count, degrees, and join
    val half = und.filter(col("src") < col("dst"))
    val mDf = broadcast(half.agg(count(lit(1)).as("__m")))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("__deg"))
    val degSum = labels.join(deg, Seq("id"), "left")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("__deg"), lit(0L))).as("degree_sum"))
    val internal = half
      .join(labels.select(col("id").as("src"), col("community").as("__ca")),
        Seq("src"))
      .join(labels.select(col("id").as("dst"), col("community").as("__cb")),
        Seq("dst"))
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    degSum.join(internal, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum"))
      .crossJoin(mDf)
      .select(col("community"), col("n_nodes"), col("internal_edges"),
        col("degree_sum"),
        (col("internal_edges").cast("double") / col("__m").cast("double") -
          (col("degree_sum").cast("double") / (col("__m") * 2).cast("double")) *
            (col("degree_sum").cast("double") / (col("__m") * 2).cast("double")))
          .as("modularity_term"))
  }

  /** Exact triangle counting + local clustering coefficient via the
    * degree-ordered orientation ("compact-forward", Latapy 2008; the
    * shape MapReduce triangle counting standardized as node-iterator++):
    * symmetrize, then orient every undirected edge from the
    * (degree, id)-smaller endpoint to the larger. The oriented graph is
    * a DAG whose max out-degree is O(√m) regardless of skew — the wedge
    * self-join fans out from the LOW-degree endpoint only, so a celebrity
    * node with degree 10⁷ contributes wedges only through its low-degree
    * neighbors, never deg² pairs from its own adjacency. Each triangle
    * is generated exactly once (a = smallest rank, pivot of the wedge).
    *
    * Scale shape: three node/edge-keyed shuffles (degree agg, wedge
    * self-join on the pivot, closing-edge equi-join on (b, c)) — nothing
    * quadratic in any node's degree, no driver state. All-integer
    * output: cc_ppm = (2·T·10⁶) div (d·(d−1)) replays exactly in SQL.
    *
    * Reference surface: extends the dedup-graph analytics family
    * (connectedComponents, pageRank, labelPropagation) with the density
    * measure — triangle-dense neighborhoods in the near-duplicate graph
    * are template families (boilerplate variants), while star-shaped
    * low-cc hubs are syndication feeds; the counts feed curation the
    * same way the reference's per-run stats feed its QC summaries.
    *
    * @param edges directed (src, dst) frame — symmetrized internally
    * @param nodes one-column (id) frame enumerating ALL nodes
    * @return (id, degree, n_triangles, cc_ppm) — isolated / degree-1
    *         nodes carry 0 triangles and cc_ppm 0
    */
  def triangles(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val und = bothDirections(edges)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // referenced by degree agg, wedges, and closure
    val deg = und.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
    // orient: keep (a, b) with (deg_a, a) < (deg_b, b)
    val oriented = und
      .join(deg.select(col("id").as("src"), col("deg").as("sdeg")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("ddeg")), Seq("dst"))
      .filter(col("sdeg") < col("ddeg") ||
        (col("sdeg") === col("ddeg") && col("src") < col("dst")))
      .select(col("src").as("a"),
        col("dst").as("b"), col("ddeg").as("bdeg"))
      .localCheckpoint() // wedge join reads it twice, closure a third time
    val wedges = oriented.select(col("a"), col("b"), col("bdeg"))
      .join(oriented.select(col("a"), col("b").as("c"), col("bdeg").as("cdeg")),
        Seq("a"))
      .filter(col("bdeg") < col("cdeg") ||
        (col("bdeg") === col("cdeg") && col("b") < col("c")))
      .select(col("a"), col("b"), col("c"))
    val tri = wedges.join(
      oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
    val perNode = tri.select(col("a").as("id"))
      .unionByName(tri.select(col("b").as("id")))
      .unionByName(tri.select(col("c").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
    nodes.select(col("id"))
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          expr("(2 * coalesce(n_triangles, 0L) * 1000000L) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_ppm"))
  }

  /** Degree assortativity (Newman 2002, "Assortative mixing in
    * networks"): the Pearson correlation of endpoint degrees over the
    * symmetrized edge list. r > 0 — hubs attach to hubs (social
    * graphs); r < 0 — hubs attach to leaves (star/syndication shapes;
    * a near-dup graph dominated by template families scores strongly
    * negative because boilerplate variants form hub-and-spoke stars
    * around the canonical page). One number that summarizes the mixing
    * structure the triangles/communities reports enumerate node by node.
    *
    * Exactness: with the directed symmetrized list, Σj = Σk and
    * Σj² = Σk², so r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²). Numerator
    * and denominator are computed as EXACT decimal integers (degrees
    * cast to DECIMAL(19,0); per-edge products fit DECIMAL(38,0); the
    * moment sums and the M·Σ products stay within 38 digits up to
    * ~10¹³ edges of degree ≤ 10⁶ — beyond any single graph this engine
    * would hold); IEEE happens ONCE, at the final division, so the
    * result replays bit-exactly in SQL. A degree-regular graph has
    * zero variance → NULL (nullif), not a 0/0 artifact.
    *
    * Scale shape: symmetrize + distinct (one edge-keyed shuffle), a
    * degree agg, two broadcast-or-shuffle joins of the edge list onto
    * the degree frame, then a single global moment agg whose partials
    * are five numbers per task — no driver state, nothing quadratic.
    *
    * Reference surface: extends the dedup-graph analytics family
    * (connectedComponents at `sentinel-core`'s run-grouping boundary,
    * pageRank, triangles) with the graph-level mixing summary.
    *
    * @param edges directed (src, dst) frame — symmetrized internally
    * @return one row (n_nodes, n_edges, assortativity): node count with
    *         degree ≥ 1, undirected edge count, r rounded to 6 places
    */
  def assortativity(edges: DataFrame): DataFrame = {
    val und = bothDirections(edges)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // read by the degree agg and the moment join
    val deg = und.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("decimal(19,0)").as("deg"))
    val moments = und
      .join(deg.select(col("id").as("src"), col("deg").as("jdeg")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("kdeg")), Seq("dst"))
      .agg(
        count(lit(1)).as("m_directed"),
        sum(col("jdeg")).as("sj"),
        sum(col("jdeg") * col("jdeg")).as("sjj"),
        sum(col("jdeg") * col("kdeg")).as("sjk"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    moments.crossJoin(broadcast(nNodes)).select(
      col("n_nodes"),
      (col("m_directed") / 2).cast("long").as("n_edges"),
      round(
        (col("m_directed").cast("decimal(19,0)") * col("sjk") -
          col("sj") * col("sj")).cast("double") /
          nullif(
            (col("m_directed").cast("decimal(19,0)") * col("sjj") -
              col("sj") * col("sj")).cast("double"), lit(0.0)),
        6).as("assortativity"))
  }

  /** Mutual (reciprocal) kNN pairs: keep (a, b) only when a lists b AND
    * b lists a — the standard high-precision cut on a kNN graph
    * (reciprocal neighbors are the near-duplicate / same-entity signal;
    * one-directional edges are mostly hub attraction, the known failure
    * mode of raw kNN in high-dimensional corpora). One self-join of the
    * slim directed edge list on the reversed key; output canonicalized
    * to id_a < id_b. All-integer, replays exactly in SQL.
    *
    * @param edges directed (src, dst) — e.g. [[Similarity.knnGraph]]
    * @return (id_a, id_b) with id_a < id_b, each mutual pair once */
  def mutualKnnPairs(edges: DataFrame): DataFrame = {
    // eager localCheckpoint: the reciprocity self-join reads e TWICE —
    // without it the upstream kNN build executes once per side
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    e.filter(col("src") < col("dst"))
      .join(e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"))
  }

  /** Degree histogram of the symmetrized graph — the one-page summary
    * (how heavy is the tail?) read before choosing skew guards for any
    * downstream graph op. Two keyed aggs; exact integers.
    *
    * @return (degree, n_nodes) for degrees >= 1, sorted by degree */
  def degreeHistogram(edges: DataFrame): DataFrame = {
    val und = bothDirections(edges)
      .filter(col("src") =!= col("dst"))
      .distinct()
    und.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))
      .groupBy(col("degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))
  }

  /** k-core decomposition at a fixed k (Seidman 1983): iteratively peel
    * nodes of degree < k until the remaining subgraph is stable; what
    * survives is the k-core — the standard density filter for curation
    * graphs (a near-dup or citation cluster that survives the 3-core is
    * structural, not an artifact of one promiscuous hub; spam/link-farm
    * detection peels cores the other way). The fixpoint is ORDER-FREE
    * (peeling is confluent: whatever removal order, the same core
    * remains), so the result is deterministic without any tie policy.
    *
    * Scale shape: edges symmetrize + distinct once (one shuffle,
    * localCheckpoint-ed — the minhashLsh policy); each round is one
    * src-keyed degree aggregate plus two node-keyed semi-joins filtering
    * the edge frame, all slim, nothing quadratic. Lineage truncates per
    * round (the [[Dedup.connectedComponents]] discipline) and the driver
    * reads ONE count per round for the fixpoint test — rounds are
    * O(peeling depth), typically ≪ 20 on power-law graphs.
    *
    * @param edges (src, dst) frame, treated as undirected; self-loops
    *              dropped
    * @param k     minimum degree to survive (≥ 1)
    * @param maxIter round cap: a graph whose peeling depth exceeds it
    *                (e.g. a long path at k=2 peels one layer per round)
    *                returns the partially-peeled SUPERSET of the core —
    *                the [[Dedup.connectedComponents]] maxIter contract
    * @return (id, core_degree): the k-core's nodes with their degree
    *         WITHIN the core (≥ k by construction)
    */
  def kCore(
      edges: DataFrame,
      k: Int = 3,
      maxIter: Int = 30): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    // one-pass symmetrize + the edge count riding the checkpoint job via
    // observe (the connectedComponents zero-extra-job pattern) — each
    // peel round previously paid a separate count() job on top of its
    // checkpoint, and the init evaluated the edge build twice
    val obs0 = org.apache.spark.sql.Observation()
    var alive = bothDirections(
      edges.select(col("src"), col("dst")).filter(col("src") =!= col("dst")))
      .distinct()
      .observe(obs0, count(lit(1)).as("n"))
      .localCheckpoint()
    var aliveEdges = obs0.get("n").asInstanceOf[Long]
    var it = 0
    var converged = aliveEdges == 0L
    while (!converged && it < maxIter) {
      val obs = org.apache.spark.sql.Observation()
      val next = kCoreRound(alive, k)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      val nextEdges = obs.get("n").asInstanceOf[Long]
      converged = nextEdges == aliveEdges
      alive = next
      aliveEdges = nextEdges
      it += 1
    }
    alive.groupBy(col("src")).agg(count(lit(1)).as("core_degree"))
      .select(col("src").as("id"), col("core_degree"))
  }

  /** ONE [[kCore]] peeling round as an un-executed plan: a src-keyed
    * degree census filtered at k, then two node-keyed LEFT-SEMI joins
    * slimming the edge frame — nothing but (src, dst) columns ever
    * shuffles. Extracted so the loop and the PLANS.md artifact share
    * the SAME code path: the post-checkpoint loop result plans as
    * `Scan ExistingRDD`, which pins nothing, while this inner shape is
    * what must not regress to a fat-frame join. */
  def kCoreRound(alive: DataFrame, k: Int): DataFrame = {
    val keep = alive.groupBy(col("src")).agg(count(lit(1)).as("__d"))
      .filter(col("__d") >= k).select(col("src").as("__keep"))
    alive
      .join(keep.withColumnRenamed("__keep", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("__keep", "dst"), Seq("dst"), "left_semi")
  }

  def pageRank(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 0 && iters <= 50, s"iters out of range: $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val n = nodes.select(col("id"))
    var ranks = n.select(col("id"), lit(1000000L).as("rank_ppm"))
    for (_ <- 0 until iters) {
      val contrib = e.join(out, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("rank_ppm div outdeg").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = n.join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + expr("(85 * coalesce(s, 0L)) div 100"))
            .as("rank_ppm"))
    }
    ranks
  }

  /** Personalized PageRank (Haveliwala 2002) in the same EXACT-integer
    * ppm semantics as [[pageRank]] — restart mass flows only to the SEED
    * set, so rank concentrates around the seeds and decays with graph
    * distance: the seed-expansion primitive ("grow this curated document
    * set along the semantic-neighbor graph", the corpus-curation
    * counterpart of topic-sensitive search ranking).
    *
    *   r₀(v)  = v∈S ? 10^6 : 0
    *   r'(v) = (v∈S ? 150000 : 0) + (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100
    *
    * Truncating integer division throughout — a DEFINED deterministic
    * semantics with no FP summation order to pin, replaying as unrolled
    * SQL CTEs exactly like [[pageRank]]'s oracle. Dangling mass dropped
    * (same documented divergence). Non-seed nodes unreachable from any
    * seed hold rank 0 — the expansion frontier is `rank_ppm > 0`.
    *
    * Scale shape: identical to [[pageRank]] — edges and out-degrees
    * localCheckpoint-ed once, each iteration one src-keyed join plus one
    * dst-keyed sum; the seed table joins as a broadcast-size frame.
    *
    * @param seeds one-column (id) frame, the restart set */
  def personalizedPageRank(
      edges: DataFrame,
      nodes: DataFrame,
      seeds: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 0 && iters <= 50, s"iters out of range: $iters")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val sd = seeds.select(col("id"), lit(1L).as("__seed"))
    val n = nodes.select(col("id")).join(sd, Seq("id"), "left")
      .select(col("id"), coalesce(col("__seed"), lit(0L)).as("__seed"))
      .localCheckpoint() // consumed every iteration plus the init
    var ranks = n.select(col("id"),
      (col("__seed") * 1000000L).as("rank_ppm"))
    for (_ <- 0 until iters) {
      val contrib = e.join(out, Seq("src"))
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"), expr("rank_ppm div outdeg").as("c"))
      val sums = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = n.join(sums.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (col("__seed") * 150000L + expr("(85 * coalesce(s, 0L)) div 100"))
            .as("rank_ppm"))
    }
    ranks
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): score every
    * NON-edge pair by Σ_w 1/ln(deg w) over common neighbors w — the
    * classic "which documents should be neighbors but aren't" query
    * (kNN-graph densification, recommendation, missing-citation
    * detection). Common neighbors through a rare hub count nearly 1
    * each; a 10⁶-degree hub contributes ~1/14 — which is also why the
    * degree guard below loses almost nothing.
    *
    * Shape: symmetrize+distinct, degree census, then the wedge fan-out —
    * pairs of each center's neighbors with `id_a < id_b` — whose cost is
    * Σ deg(w)²: the quadratic hazard lives at the hubs, so centers with
    * deg > `maxWedgeDegree` are EXCLUDED as wedge centers (fail-safe,
    * not fail-slow; idle on bounded-degree graphs like kNN; when it
    * fires the documented trade is the hubs' ~1/ln(deg)-per-wedge
    * contribution). Existing edges drop via one anti-join; the cut is a
    * `TakeOrderedAndProject`.
    *
    * Exactness: per-pair scores fold the common-neighbor list in PINNED
    * center-id order (sorted struct array — the [[graft.operators
    * .Reports.zipfFit]] discipline; a plain double SUM would be
    * engine-order dependent), ln from exact integer degrees.
    *
    * @return (id_a, id_b, n_common, aa_score) top-k by score desc,
    *         ties (id_a, id_b); score 6-rounded */
  def linkPrediction(
      edges: DataFrame,
      topK: Int = 20,
      maxWedgeDegree: Int = 10000): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    require(maxWedgeDegree >= 2, s"maxWedgeDegree >= 2: $maxWedgeDegree")
    val und = bothDirections(edges)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // degree census + wedge join + edge anti-join
    val deg = und.groupBy(col("src").as("w")).agg(count(lit(1)).as("deg"))
    // neighbor lists keyed by the wedge CENTER w, hub centers excluded
    val byCenter = und
      .select(col("src").as("w"), col("dst").as("nb"))
      .join(deg.filter(col("deg") <= maxWedgeDegree), Seq("w"))
    val pairs = byCenter
      .join(byCenter.select(col("w"), col("nb").as("nb2"),
        col("deg").as("deg2")), Seq("w"))
      .filter(col("nb") < col("nb2"))
      .select(col("nb").as("id_a"), col("nb2").as("id_b"),
        col("w"), col("deg"))
    val scored = pairs
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"),
        sort_array(collect_list(struct(col("w"), col("deg")))).as("__ws"))
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(aggregate(col("__ws"), lit(0.0), (acc, c) =>
          acc + lit(1.0) / log(c.getField("deg").cast("double"))), 6)
          .as("aa_score"))
    scored
      .join(und.select(col("src").as("id_a"), col("dst").as("id_b")),
        Seq("id_a", "id_b"), "left_anti")
      .orderBy(col("aa_score").desc, col("id_a"), col("id_b"))
      .limit(topK)
  }

  /** Multi-source BFS hop distance: for every node reachable from the
    * seed set within `maxHops` directed hops, the MINIMUM hop count —
    * the expansion primitive behind "everything within k links of these
    * documents" (neighborhood sampling, blast-radius analysis,
    * similarity-graph crawl ordering).
    *
    * Level-synchronous frontier expansion, the [[kCore]] loop
    * discipline: each round is one semi-join (edges from the current
    * frontier) + one anti-join (drop already-labeled nodes) over slim
    * (id) frames, a localCheckpoint to truncate lineage, and ONE driver
    * count to detect an empty frontier. Rounds ≤ maxHops regardless of
    * data. First-discovery labeling IS the min-hop distance
    * (level-synchronous BFS invariant), so the result is order-free and
    * replays in SQL as a bounded recursive walk finished by min(hops).
    *
    * @param edges directed (src, dst)
    * @param seeds (id) — hop 0; deduplicated here
    * @return (id, hops), hops ∈ [0, maxHops] */
  def bfsHops(
      edges: DataFrame,
      seeds: DataFrame,
      maxHops: Int = 8): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64, s"maxHops out of range: $maxHops")
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("hops")).localCheckpoint()
    var frontier = dist.select(col("id"))
    var hop = 0
    var emptyFrontier = false
    while (hop < maxHops && !emptyFrontier) {
      hop += 1
      // frontier count rides the checkpoint job (observe — no separate
      // count() job per level); `dist` stays a UNION of the per-level
      // checkpoints rather than re-checkpointing the whole labeling
      // every round — each leaf is already materialized, so the union's
      // lineage is maxHops shallow reads, and the old re-checkpoint
      // re-wrote all prior levels' rows once per level (O(maxHops²) row
      // writes; guide §5)
      val obs = org.apache.spark.sql.Observation()
      val next = bfsRound(e, frontier, dist, hop)
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint()
      emptyFrontier = obs.get("n").asInstanceOf[Long] == 0L
      if (!emptyFrontier) {
        dist = dist.union(next)
        frontier = next.select(col("id"))
      }
    }
    dist
  }

  /** Hop-distance histogram over a [[bfsHops]] labeling: nodes per hop
    * count, cumulative reach, and the reach fraction — the expansion
    * curve ("how much of the graph is within k hops of the seeds")
    * whose 90%-knee is the effective diameter a crawl scheduler or
    * blast-radius analysis reads off.
    *
    * Scale shape: one keyed count collapses the node-scale labeling to
    * ≤ maxHops+1 rows; the cumulative comes from the tiny self-join on
    * that frame (the quantileNormalize below-join — ≤ (maxHops+1)²
    * cells, NO unpartitioned window) plus a 1-row total broadcast.
    * Exact integers, one IEEE division per row, 6-rounded.
    *
    * @return (hops, n_nodes, cum_nodes, pct_reached) ascending */
  def hopHistogram(dist: DataFrame): DataFrame = {
    val hist = dist.groupBy(col("hops")).agg(count(lit(1)).as("n_nodes"))
      .localCheckpoint() // cum self-join + total share it
    val tot = broadcast(hist.agg(sum(col("n_nodes")).as("__t")))
    val cum = hist
      .join(hist.select(col("hops").as("__h2"), col("n_nodes").as("__n2")),
        col("__h2") < col("hops"), "left")
      .groupBy(col("hops"), col("n_nodes"))
      .agg((col("n_nodes") + coalesce(sum(col("__n2")), lit(0L)))
        .as("cum_nodes"))
    cum.crossJoin(tot)
      .select(col("hops"), col("n_nodes"), col("cum_nodes"),
        round(col("cum_nodes").cast("double") / col("__t").cast("double"), 6)
          .as("pct_reached"))
      .orderBy(col("hops"))
  }

  /** ONE [[bfsHops]] frontier round as an un-executed plan: a LEFT-SEMI
    * join selecting edges leaving the frontier, a distinct over the new
    * ids, and a LEFT-ANTI join dropping already-labeled nodes — slim
    * (id)/(src, dst) frames only, one shuffle key each. Extracted so
    * the loop and the PLANS.md artifact share the SAME code path (the
    * post-checkpoint result plans as `Scan ExistingRDD` and pins
    * nothing). */
  def bfsRound(
      e: DataFrame,
      frontier: DataFrame,
      dist: DataFrame,
      hop: Int): DataFrame =
    e.join(frontier.select(col("id").as("src")), Seq("src"), "left_semi")
      .select(col("dst").as("id")).distinct()
      .join(dist, Seq("id"), "left_anti")
      .select(col("id"), lit(hop.toLong).as("hops"))
}
