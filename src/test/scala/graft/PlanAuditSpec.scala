package graft

/** Physical-plan audits over the sf0.001 testdata: the properties that
  * make these operators scale are asserted here so they cannot silently
  * regress — filters reach the scan, projections prune columns, small
  * dimensions broadcast, aggregates partial-aggregate map-side, and
  * top-k compiles to TakeOrderedAndProject. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executed(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def occurrences(haystack: String, needle: String): Int =
    haystack.sliding(needle.length).count(_ == needle)

  "sel_eq" should "push the equality filter into the parquet scan" in {
    val plan = executed("sel_eq")
    plan should include("PushedFilters")
    plan should include("EqualTo(l_returnflag,R)")
  }

  "text_stats" should "prune the scan to the referenced columns only" in {
    val plan = executed("text_stats")
    plan should include("ReadSchema: struct<doc_id:bigint,text:string")
    plan should not include "n_chars"
  }

  "topk_orders" should "compile orderBy().limit() to TakeOrderedAndProject" in {
    executed("topk_orders") should include("TakeOrderedAndProject")
  }

  "join_customer_geo" should "broadcast the dimension sides" in {
    val plan = executed("join_customer_geo")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  "stats_agg_quantity" should "partial-aggregate map-side" in {
    val plan = executed("stats_agg_quantity")
    plan should include("partial_count")
    plan should include("partial_sum")
  }

  "dedup_exact" should "be a hash aggregate with map-side partials, never a pairwise join" in {
    val plan = executed("dedup_exact")
    plan should include("HashAggregate")
    plan should not include "Join"
  }

  "vector_ivf_topk" should "assign cells without a cartesian product" in {
    val plan = executed("vector_ivf_topk")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "vector_knn" should "broadcast the query side and push the per-group top-k" in {
    val plan = executed("vector_knn")
    // non-equi self-exclusion condition ⇒ nested-loop, but with the tiny
    // query side BROADCAST (BuildRight) — the corpus streams exactly once
    plan should include("BroadcastNestedLoopJoin BuildRight")
    // Spark 4 pushes rank()<=k down as a partial per-group limit
    plan should include("WindowGroupLimit")
  }

  "star_revenue" should "stream the fact once through broadcast dim joins, partial-agg the rollup" in {
    val plan = executed("star_revenue")
    plan should include("BroadcastHashJoin")
    // the fact side must never sort-merge against a dim
    plan should not include "SortMergeJoin"
    plan should include("partial_sum")
  }

  "vector_knn_int8" should "score with the codegen'd integer dot under the same broadcast plan" in {
    val plan = executed("vector_knn_int8")
    plan should include("BroadcastNestedLoopJoin BuildRight")
    plan should include("graft_dot_int")
    plan should include("WindowGroupLimit")
  }

  // the r17 native kernel computes each signature in ONE per-row pass:
  // the plan must stay a pure projection — no shingle explode, no
  // signature aggregate, no exchange beyond the small-input Fan spread
  // (the shape the optimization bought; a regression back to the
  // declarative explode + min-agg pipeline re-adds a corpus-scale
  // Generate and a shuffle to every MinHash consumer)
  "minhash signatures" should "stay a one-pass projection (native kernel, no explode/aggregate)" in {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = graft.operators.Dedup.minhashSignatures(docs, k = 8)
      .queryExecution.executedPlan.toString
    plan should include("graft_minhash_sig")
    plan should not include "Generate"
    plan should not include "HashAggregate"
  }

  "simhash per-doc" should "partial-aggregate the bit parities" in {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    graft.operators.Dedup.simhashPerDoc(docs, nBits = 32)
      .queryExecution.executedPlan.toString should include("partial_sum")
  }

  "dedup_minhash_pairs" should "avoid cartesian joins" in {
    executed("dedup_minhash_pairs") should not include "CartesianProduct"
  }

  "dedup_simhash_hamming" should "avoid cartesian joins" in {
    executed("dedup_simhash_hamming") should not include "CartesianProduct"
  }

  "curate_corpus" should "prune the document scan to id+text" in {
    val plan = executed("curate_corpus")
    plan should include("ReadSchema: struct<doc_id:bigint,text:string>")
    plan should not include "n_chars:bigint," // source column never read
  }

  "curate_sample" should "use a partitioned window plus broadcast offsets, not a global window" in {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("curate_sample")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    windows should not be empty
    all(windows.map(_.partitionSpec)) should not be empty
  }

  "asof_join" should "be one keyed window pass, never a range join" in {
    val plan = executed("asof_join")
    plan should include("Window")
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
  }

  "range_join_events" should "equi-join on bin keys, never BroadcastNestedLoop" in {
    val plan = executed("range_join_events")
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
  }

  "quality_gopher" should "prune the scan to id+text and partial-aggregate the token stats" in {
    val plan = executed("quality_gopher")
    plan should include("ReadSchema: struct<doc_id:bigint,text:string>")
    plan should include("partial_count")
  }

  "lm_score" should "prune the scan and keep every join an equi- or broadcast join" in {
    val plan = executed("lm_score")
    plan should include("ReadSchema: struct<doc_id:bigint,text:string>")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin" // count frames broadcast at this SF
  }

  "bm25_search" should "take the top-k without a global sort and aggregate tf map-side" in {
    val plan = executed("bm25_search")
    plan should include("TakeOrderedAndProject")
    plan should include("partial_count")
  }

  "semantic_dedup" should "block by cell with an equi-join, never a cartesian product" in {
    val plan = executed("semantic_dedup")
    plan should not include "CartesianProduct"
  }

  "knn_graph" should "block by cell with an equi-join, never a cartesian product" in {
    val plan = executed("knn_graph")
    plan should not include "CartesianProduct"
    plan should include("WindowGroupLimit") // rank<=k pushed as a group limit
  }

  "dedup_substrings_exact" should "stay keyed end to end (census, pair join, windows)" in {
    val plan = executed("dedup_substrings_exact")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("HashAggregate") // gram census partial-aggregates
  }

  "vector_neardup_lsh_mp" should "pair probes via the bucket equi-join, never a cartesian product" in {
    val plan = executed("vector_neardup_lsh_mp")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "text_langid_script" should "stay a pure fan-out projection (no joins or aggregates)" in {
    // row-local end to end; the only exchange allowed is Fan.spread's
    // round-robin repartition unlocking cores for the 20-table scorer
    val plan = executed("text_langid_script")
    plan should not include "Join"
    plan should not include "HashAggregate"
  }

  "vector_pq_encode" should "assign codes inside the codegen span with no join at all" in {
    val plan = executed("vector_pq_encode")
    plan should include("graft_nearest_cell_l2")
    plan should not include "Join"
  }

  "vector_pq_topk" should "score ADC via an equi-join on (sub, code), never a cartesian product" in {
    val plan = executed("vector_pq_topk")
    plan should not include "CartesianProduct"
    plan should include("graft_nearest_cell_l2")
  }

  "text_normalize" should "stay a shuffle-free projection with graft_nfc inside the codegen span" in {
    val plan = executed("text_normalize")
    plan should not include "Exchange"
    plan should include("graft_nfc")
    plan should include("*(1) Project") // whole-stage codegen, not fallback
  }

  "split_assign" should "stay a pure per-row projection (no exchange at all)" in {
    val plan = executed("split_assign")
    plan should not include "Exchange"
  }

  "domain_mix" should "partial-aggregate the per-source stats map-side" in {
    val plan = executed("domain_mix")
    plan should include("partial_count")
    plan should include("partial_sum")
  }

  "quality_classifier" should "stay one row-local projection (no exchange) on a pruned scan" in {
    val plan = executed("quality_classifier")
    plan should not include "Exchange"
    plan should include("ReadSchema: struct<doc_id:bigint,text:string")
  }

  "winnow_fingerprints" should "select fingerprints row-locally (no exchange)" in {
    val plan = executed("winnow_fingerprints")
    plan should not include "Exchange"
  }

  "temperature_mix" should "broadcast the 1-row normalizer back over the per-source aggregate" in {
    val plan = executed("temperature_mix")
    plan should include("Broadcast")
    plan should include("partial_count")
  }

  "vocab_coverage" should "broadcast the top-K vocabulary into the token join" in {
    val plan = executed("vocab_coverage")
    plan should include("BroadcastHashJoin")
  }

  "market_share" should "broadcast every dimension and never cross-join" in {
    val plan = executed("market_share")
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  "hll_distinct" should "run the sketch as a partial aggregate (buffers shuffle, not rows)" in {
    val plan = executed("hll_distinct")
    plan should include("partial_graft_hll_count")
  }

  "dedup_winnow_pairs" should "select fingerprints natively and never cross-join" in {
    val plan = executed("dedup_winnow_pairs")
    plan should include("graft_winnow")
    plan should not include "CartesianProduct"
  }

  "event_funnel" should "broadcast the 1-row step counts, never a cartesian join" in {
    val plan = executed("event_funnel")
    plan should include("BroadcastNestedLoopJoin")
    plan should not include "CartesianProduct"
  }

  "length_quantiles_approx" should "run the GK sketch as a partial aggregate" in {
    executed("length_quantiles_approx") should include("partial_percentile_approx")
  }

  "overlap_join_events" should "stay an equi-join on (user, bin) — never a nested-loop" in {
    val plan = executed("overlap_join_events")
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  "sample_per_group" should "push the per-group cut as WindowGroupLimit" in {
    executed("sample_per_group") should include("WindowGroupLimit")
  }

  "vector_ivfpq_topk" should "score through broadcast joins with map-side agg partials, per-group limit pushed" in {
    val plan = executed("vector_ivfpq_topk")
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "SortMergeJoin"
    // the ADC fold partial-aggregates before the one keyed exchange, and
    // the top-k cut is pushed as a partial per-group limit
    plan should include("ObjectHashAggregate")
    plan should include("WindowGroupLimit")
  }

  "pagerank_knn" should "iterate with keyed equi-joins over the checkpointed edge frame" in {
    val plan = executed("pagerank_knn")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    // edges come from the eager localCheckpoint, not a re-run of the kNN
    // self-join — the scan side of each iteration is the materialized RDD
    plan should include("Scan ExistingRDD")
  }

  "cms_heavy_hitters" should "probe a broadcast sketch and broadcast the bounded candidate set" in {
    val plan = executed("cms_heavy_hitters")
    plan should include("BroadcastHashJoin")
    plan should include("graft_cms")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  "vocab_growth" should "run both prefix sums in one band-partitioned window over the checkpointed base" in {
    val plan = executed("vocab_growth")
    // the first-seen agg + join happen before the eager localCheckpoint,
    // so the final plan reads the materialized blocks
    plan should include("Scan ExistingRDD")
    // banded two-pass prefix sum: both running sums ride ONE window
    // partitioned by __band (the whole-suite audit below proves no
    // global window anywhere)
    plan should include("windowspecdefinition(__band")
    plan should include("BroadcastHashJoin")
    plan should not include "CartesianProduct"
  }

  "robust_stats" should "sort per group (lang-partitioned windows), never globally" in {
    val plan = executed("robust_stats")
    plan should include("windowspecdefinition(lang")
    plan should not include "CartesianProduct"
    // the per-group 1-row percentile frame joins back by broadcast
    plan should include("BroadcastHashJoin")
  }

  "quality_ecdf" should "rank inside lang partitions over one pruned scan" in {
    val plan = executed("quality_ecdf")
    plan should include("windowspecdefinition(lang")
    plan should not include "Exchange hashpartitioning(doc_id"
  }

  "zorder_layout" should "be a pure row-local projection with no shuffle at all" in {
    val plan = executed("zorder_layout")
    plan should not include "Exchange"
    plan should not include "Join"
  }

  "rrf_fusion" should "rank per modality and cut with TakeOrderedAndProject" in {
    val plan = executed("rrf_fusion")
    plan should include("windowspecdefinition(__m")
    plan should include("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  "mmr_rerank" should "iterate over the checkpointed shortlist with keyed joins only" in {
    val plan = executed("mmr_rerank")
    plan should include("Scan ExistingRDD")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  "label_prop" should "iterate keyed equi-joins over the checkpointed symmetrized edges" in {
    val plan = executed("label_prop")
    plan should include("Scan ExistingRDD")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "lm_score_backoff" should "probe the count tables with equi-joins, partial-agg map-side" in {
    val plan = executed("lm_score_backoff")
    plan should not include "CartesianProduct"
    plan should include("partial_count")
  }

  "ngram_novelty" should "aggregate grams with map-side partials and no cartesian" in {
    val plan = executed("ngram_novelty")
    plan should include("HashAggregate")
    plan should not include "CartesianProduct"
  }

  "text_entropy and embed_hash" should "stay row-local projections (no keyed shuffle)" in {
    // Fan.spread's round-robin exchange is the deliberate CPU fan-out;
    // what must not appear is a keyed shuffle or any join
    for (q <- Seq("text_entropy", "embed_hash")) {
      val plan = executed(q)
      plan should not include "Exchange hashpartitioning"
      plan should not include "Join"
      plan should not include "Aggregate"
    }
  }

  "embed_covariance" should "fold the corpus through the partial-merging native gram aggregate" in {
    val plan = executed("embed_covariance")
    // TypedImperativeAggregate ⇒ ObjectHashAggregate with a partial pass:
    // each task folds into ONE fixed buffer; the shuffle moves buffers,
    // never (row × d²) exploded rows
    plan should include("graft_gram_matrix")
    plan should include("ObjectHashAggregate")
    plan should include("partial_graft_gram_matrix")
    // the 2080-entry decode joins ONE broadcast row
    plan should not include "SortMergeJoin"
  }

  "embed_pca" should "project row-locally through the codegen'd dot kernel" in {
    // the registered query is now the verdict row (its projection pass
    // runs as a construction-time job), so the row-local-projection
    // audit points at the projection operator itself
    val plan = graft.operators.Similarity
      .pcaProject(spark.read.parquet(s"$sf/embeddings.parquet"), d = 64, k = 4)
      .queryExecution.executedPlan.toString
    plan should include("graft_dot")
    plan should not include "Exchange hashpartitioning"
    plan should not include "Join"
  }

  "attribution_banded" should "shuffle and sort on (user, band), never the bare user key" in {
    val plan = executed("attribution_banded")
    plan should include("__band")
    plan should include("hashpartitioning(user_id")
    // one window over the banded partitioning, no extra exchange after it
    plan should include("windowspecdefinition(user_id")
  }

  "bm25_deleted" should "anti-join tombstones without ever reading the text column" in {
    val plan = executed("bm25_deleted")
    plan should not include "text"
    plan should include("BroadcastHashJoin")
    plan should include("LeftAnti")
  }

  "phrase_search_indexed" should "answer from positional postings without reading text" in {
    val plan = executed("phrase_search_indexed")
    plan should not include "text"
    plan should include("TakeOrderedAndProject")
  }

  "text_entropy and embed_hash" should "score through the native one-pass kernels, not interpreted HOF folds" in {
    // the r9 `weak`: a HOF refactor stays CORRECT (oracle can't see it)
    // but recomputes loop-invariant hashes per output dimension — pin the
    // native expressions in the executed plans so the regression is loud
    val sketch = executed("embed_hash")
    sketch should include("graft_count_sketch")
    // all hashing lives inside the kernel — no per-dimension md5 pair
    // array survives in the projection
    sketch should not include "md5("
    val entropy = executed("text_entropy")
    entropy should include("graft_token_entropy")
  }

  "hist_lengths" should "partial-aggregate the bin counts map-side with no join" in {
    val plan = executed("hist_lengths")
    plan should include("partial_count")
    plan should not include "Join"
  }

  "lsh_calibration" should "join truth sets onto banded pairs, never all-pairs" in {
    val plan = executed("lsh_calibration")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "ewma_smooth" should "be one user-keyed aggregation with no join" in {
    val plan = executed("ewma_smooth")
    plan should include("Aggregate")
    // the bounded-fold contract: history rides the LastKValuesAgg
    // partial aggregate (fixed per-key state), never a collect_list
    plan should include("graft_last_k_values")
    plan should not include "collect_list"
    plan should not include "Join"
    plan should not include "Window"
  }

  "topk_concentration" should "cut the top users via TakeOrdered and broadcast the 1-row total" in {
    val plan = executed("topk_concentration")
    plan should include("TakeOrderedAndProject")
    plan should include("partial_count")
    plan should not include "SortMergeJoin"
  }

  "link_prediction" should "wedge-join without a cartesian and cut via TakeOrdered" in {
    val plan = executed("link_prediction")
    plan should include("TakeOrderedAndProject")
    plan should not include "CartesianProduct"
  }

  "neyman_sample and quantile_normalize" should "broadcast the tiny rate/rank tables onto the corpus" in {
    for (q <- Seq("neyman_sample", "quantile_normalize")) {
      val plan = executed(q)
      plan should include("BroadcastHashJoin")
      plan should not include "SortMergeJoin"
    }
  }

  "cusum_changepoint" should "window the hour frame partitioned by type, never the event stream" in {
    val plan = executed("cusum_changepoint")
    // the only Window execs sit above the hourly partial-count agg
    plan should include("partial_count")
    plan should include("Window")
    plan should not include "Join"
  }

  "rfm_features" should "be one user-keyed pass with the 1-row anchor broadcast" in {
    val plan = executed("rfm_features")
    plan should include("partial_count")
    plan should include("BroadcastNestedLoopJoin") // 1-row cross anchor
    plan should not include "SortMergeJoin"
    plan should not include "Window"
  }

  "revenue_gini" should "rank inside bands with broadcast offsets, never a global sort" in {
    val plan = executed("revenue_gini")
    plan should include("Window")
    plan should include("BroadcastHashJoin") // band offsets onto customers
    plan should not include "SortMergeJoin"
  }

  "did_estimate and survival_km and benford_digits" should "broadcast their 1-row anchors onto one keyed agg" in {
    for (q <- Seq("did_estimate", "survival_km", "benford_digits")) {
      val plan = executed(q)
      plan should include("BroadcastNestedLoopJoin")
      plan should not include "SortMergeJoin"
    }
  }

  "mann_whitney" should "midrank per-value counts without any per-row rank window" in {
    val plan = executed("mann_whitney")
    plan should include("Window")      // in-band exclusive cumsum
    plan should not include "row_number" // ranks never materialize per row
    plan should include("partial_sum")   // U/tie moments combine map-side
  }

  "bootstrap_ci" should "map-side combine the replicate sums" in {
    val plan = executed("bootstrap_ci")
    plan should include("partial_sum") // B-way explode combines per task
    plan should include("BroadcastNestedLoopJoin") // 1-row CI frame
    plan should not include "SortMergeJoin"
  }

  "t_closeness" should "broadcast the bucket spine and window per class" in {
    val plan = executed("t_closeness")
    plan should include("BroadcastNestedLoopJoin") // classes x spine grid
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  "item_cf" should "pair on the user key with no cartesian and rank per item" in {
    val plan = executed("item_cf")
    plan should not include "CartesianProduct"
    plan should include("Window")
  }

  "rolling_active_users_hll" should "partial-aggregate HLL registers map-side over the broadcast day grid" in {
    val plan = executed("rolling_active_users_hll")
    // the 100 TB contract: fixed-size register states shuffle, not
    // (day, user) pairs — partial hll agg + broadcast grid join
    plan should include("partial_graft_hll_count")
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  "holt_smooth" should "ride the same bounded LastKValuesAgg fold as ewma" in {
    val plan = executed("holt_smooth")
    plan should include("Aggregate")
    plan should include("graft_last_k_values")
    plan should not include "collect_list"
    plan should not include "Join"
    plan should not include "Window"
  }

  "holt_winters" should "fold the calendar-bounded hour list with no window and no join" in {
    val plan = executed("holt_winters")
    plan should include("Aggregate")
    // event-scale work is the (type, hour) count; the seasonal fold is a
    // projection over the calendar-bounded packed list
    plan should not include "Join"
    plan should not include "windowspecdefinition"
  }

  "compaction_plan" should "be one slim keyed agg with map-side partials and no join" in {
    val plan = executed("compaction_plan")
    plan should include("partial_count")
    plan should not include "Join"
  }

  "graph_assortativity" should "never go all-pairs; only the 1-row scalar frame broadcasts nested-loop" in {
    val plan = executed("graph_assortativity")
    plan should not include "CartesianProduct"
    // degree joins are keyed equi-joins, never nested loops over edges:
    // the only BroadcastNestedLoopJoin is the 1-row n_nodes scalar
    occurrences(plan, "BroadcastNestedLoopJoin") should be <= 1
  }

  "ate_poststrat" should "fold strata in one row with no window and only the scalar broadcast" in {
    val plan = executed("ate_poststrat")
    plan should not include "windowspecdefinition"
    plan should not include "CartesianProduct"
    // the one nested-loop is the 1-row strata-census broadcast
    occurrences(plan, "BroadcastNestedLoopJoin") should be <= 1
  }

  "conformal_interval" should "rank residuals on the slim distinct-value frame, never collect per group" in {
    val plan = executed("conformal_interval")
    // the cumulative count rides a type-partitioned window over the
    // distinct-residual frame; the mu join onto calibration broadcasts
    plan should include("windowspecdefinition(__t")
    plan should include("BroadcastHashJoin")
    plan should not include "collect_list"
  }

  "changepoint_meanshift" should "score candidates via type-partitioned windows with no join" in {
    val plan = executed("changepoint_meanshift")
    plan should include("windowspecdefinition(event_type")
    plan should not include "Join"
    plan should not include "collect_list"
  }

  "attribution_position" should "rank touches on conversion-partitioned windows, all-integer credits" in {
    val plan = executed("attribution_position")
    plan should include("windowspecdefinition(__pid")
    plan should not include "collect_list"
  }

  "zorder_pruning" should "assign files row-locally from the broadcast census - no global sort" in {
    val plan = executed("zorder_pruning")
    plan should not include "windowspecdefinition"
    plan should include("BroadcastNestedLoopJoin") // the 1-row census
    plan should not include "CartesianProduct"
  }

  "skipgram_pairs and k_anonymity" should "generate row-locally and count with map-side partials" in {
    for (q <- Seq("skipgram_pairs", "k_anonymity")) {
      val plan = executed(q)
      plan should include("partial_count")
      plan should not include "Join"
    }
  }

  "pmi_collocations" should "broadcast marginals onto the checkpointed pair table, cut via TakeOrdered" in {
    val plan = executed("pmi_collocations")
    plan should include("TakeOrderedAndProject")
    plan should include("Scan ExistingRDD")
    plan should not include "CartesianProduct"
    plan should not include "SortMergeJoin"
  }

  "domain_reweight" should "join the slim nll frame and broadcast the 1-row normalizer" in {
    val plan = executed("domain_reweight")
    plan should not include "CartesianProduct"
    plan should include("partial_count")
  }

  "quality_calibration" should "be one projection + one keyed agg, no join" in {
    val plan = executed("quality_calibration")
    plan should include("partial_count")
    plan should not include "Join"
  }

  "source_overlap" should "self-join on the fingerprint key, never all-pairs" in {
    val plan = executed("source_overlap")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("Scan ExistingRDD") // the checkpointed keyed frame
  }

  "dq_expectations" should "partial-aggregate every rule in one scan per union leg" in {
    val plan = executed("dq_expectations")
    plan should include("partial_sum")
    plan should not include "Join"
  }

  "embed_rp" should "stay a shuffle-free projection scoring through the native dot kernel" in {
    val plan = executed("embed_rp")
    plan should not include "Exchange hashpartitioning"
    plan should not include "Join"
    plan should include("graft_dot")
  }

  "join_bloom_reduced" should "pre-filter the fact side with the bloom probe before any join" in {
    val plan = executed("join_bloom_reduced")
    plan should include("graft_bloom_contains")
    plan should not include "CartesianProduct"
    // the dim filter reaches the part scan
    plan should include("PushedFilters")
  }

  "join_salted" should "stay an equi-join on the salted key (no nested loop)" in {
    val plan = executed("join_salted")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "retention_cohorts" should "collapse to distinct (user, week) with map-side partials, window partitioned by cohort" in {
    val plan = executed("retention_cohorts")
    plan should include("partial_count")
    plan should include("windowspecdefinition(cohort_week")
    plan should not include "CartesianProduct"
  }

  "multimodal_neardup" should "pair via the band equi-join, never all-pairs" in {
    val plan = executed("multimodal_neardup")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  "blocklist_ac" should "stay a row-local projection (no join, no keyed shuffle)" in {
    val plan = executed("blocklist_ac")
    plan should not include "Join"
    plan should not include "Exchange hashpartitioning"
  }

  "key_skew_report" should "take its top-20 without a global sort" in {
    executed("key_skew_report") should include("TakeOrderedAndProject")
  }

  "embed_centroids" should "partial-aggregate map-side" in {
    executed("embed_centroids") should include("partial_count")
  }

  "rollup_incremental" should "serve reads from the persisted partials, not a recompute" in {
    // the upserts run at construction; the returned frame must be a scan
    // of the warehouse table plus the reporting projection — no
    // aggregation of raw events left in the read path
    val plan = executed("rollup_incremental")
    plan should include("Scan parquet")
    plan should not include "HashAggregate"
  }

  "hourlyPartials" should "partial-aggregate the delta map-side" in {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "unix_micros(cast(ts as timestamp))"))
    graft.store.Rollups.hourlyPartials(ev)
      .queryExecution.executedPlan.toString should include("partial_count")
  }

  "graph_communities" should "stay keyed equi-joins over the checkpointed edges" in {
    val plan = executed("graph_communities")
    plan should not include "CartesianProduct"
    plan should include("Scan ExistingRDD")
  }

  "event_transitions" should "normalize on the matrix frame with a from-state window" in {
    val plan = executed("event_transitions")
    plan should include("windowspecdefinition(from_type")
    plan should not include "Join"
  }

  "vector_knn and semantic_dedup" should "score with the native graft_dot kernel, not an interpreted HOF" in {
    // a refactor that fell back to aggregate(zip_with(...)) would still
    // be correct but lose the codegen'd kernel (~123× on the scoring
    // loop) — pin the native expression in the ANN plans themselves
    for (q <- Seq("vector_knn", "semantic_dedup")) {
      val plan = executed(q)
      withClue(s"$q: ") {
        plan should include("graft_dot")
        plan should not include "zip_with"
      }
    }
  }

  "user-written HOF dot products" should "be rewritten to the native kernel (NativeDotRewrite)" in {
    spark.read.parquet(s"$sf/embeddings.parquet")
      .createOrReplaceTempView("emb_plan_audit")
    val q = spark.sql(
      """SELECT vec_id,
        |  aggregate(zip_with(embedding, embedding,
        |    (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |    0D, (acc, v) -> acc + v) AS norm2
        |FROM emb_plan_audit""".stripMargin)
    q.queryExecution.optimizedPlan.toString should include("graft_dot")
    q.queryExecution.executedPlan.toString should not include "zip_with"
  }

  "the whole suite" should "contain no unpartitioned Window (single-partition scale-killer)" in {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val unpartitioned = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      withClue(s"query $name has a global (unpartitioned) window: ") {
        unpartitioned shouldBe empty
      }
    }
  }

  // ---- per-round inner plans of the iterative family -------------------
  // The registered loop queries plan as Scan ExistingRDD/LocalTableScan
  // (checkpoint truncation / driver solve), so these pins run the
  // operators' extracted round methods — the same code path the loops
  // execute — over the registered queries' real inputs.

  private def innerExecuted(name: String): String =
    SparkEntry.innerPlans(name)(spark, sf)
      .queryExecution.executedPlan.toString

  "graph_bfs inner round" should "be slim semi/anti joins, never a fat-frame join" in {
    val plan = innerExecuted("graph_bfs")
    plan should include("LeftSemi")
    plan should include("LeftAnti")
    // only the slim id/edge columns ever shuffle — no embedding payload
    plan should not include "embedding"
    plan should not include "CartesianProduct"
  }

  "graph_kcore inner round" should "peel via a degree census and two semi-joins" in {
    val plan = innerExecuted("graph_kcore")
    occurrences(plan, "LeftSemi") should be >= 2
    plan should include("partial_count")
    plan should not include "embedding"
  }

  "dedup_clusters inner round" should "fold neighbor minima with a partial-min aggregate" in {
    val plan = innerExecuted("dedup_clusters")
    plan should include("partial_min")
    plan should include("LeftOuter")
    // topology only: the text/shingle payload never enters the loop
    plan should not include "text"
  }

  "attribution_markov inner census" should "reduce transitions with a keyed partial count over partitioned windows" in {
    val plan = innerExecuted("attribution_markov")
    plan should include("partial_count")
    plan should include("Window")
    plan should not include "CartesianProduct"
  }

  "every innerPlans key" should "name a registered query" in {
    SparkEntry.innerPlans.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }

  "entry" should "smoke on sf0.001 with rows" in {
    SparkEntry.entry(spark).count() should be > 0L
  }
}
