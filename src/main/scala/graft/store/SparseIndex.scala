package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}
import graft.operators.Fan

/** Persisted inverted index for sparse (BM25) retrieval — the
  * build-once/query-many artifact story ([[AnnArtifacts]]) applied to
  * the sparse leg: tokenizing 100 TB of text costs one corpus pass, so a
  * retrieval service does it ONCE, persists the postings, and every
  * query afterwards touches only slim keyed frames (postings for the
  * query's terms + doc lengths), never the text.
  *
  * Stored shape (three Warehouse tables per index):
  *  - `<name>` postings: (term, id, tf) — term-keyed, the real index;
  *  - `<name>__dl` doc lengths: (id, dl);
  *  - `<name>__meta`: (n_docs, sum_dl) as exact BIGINTs — `avgdl` is
  *    DERIVED at query time with the same single IEEE division the
  *    from-text scorer uses, so a loaded index scores BIT-IDENTICALLY to
  *    [[graft.operators.Curation.bm25Search]] over the same corpus (the
  *    `vector_pq_persisted` contract, applied to text).
  *
  * [[append]] absorbs newly-admitted documents the
  * [[AnnArtifacts.appendToBandIndex]] way: tokenize only the NEW docs,
  * append their postings/lengths, bump the meta counts — old text is
  * never re-read, and append-then-query equals rebuild-then-query
  * exactly (spec'd), because every stored quantity is mergeable.
  * [[delete]] is the other direction: evicted docs tombstone (one slim
  * pass, postings untouched), queries anti-join the tombstones, and
  * delete-then-query equals rebuild-then-query exactly too; [[compact]]
  * retires accumulated tombstones into a copy-on-write rewrite.
  *
  * Reference surface: the reference's get-or-create dictionary lookups
  * key stored records by content checksum so re-uploads reuse the stored
  * artifact (sentinel-core adapters/ReferencesAdapter.scala via
  * models/ReferenceRecord combinedMd5) — the same store-derived-data-
  * once discipline, applied to the retrieval index.
  */
object SparseIndex {

  private def dlTable(name: String): String = s"${name}__dl"
  private def metaTable(name: String): String = s"${name}__meta"
  private def tombTable(name: String): String = s"${name}__tomb"

  /** ONE tokenize pass for the whole index build (optimization r17,
    * guide §1.2 step 1 + §2.4): term frequency is a per-document
    * aggregate, so the row-local [[org.apache.spark.sql.graft
    * .TokenTfEntries]] kernel computes each doc's (term, tf) entries in
    * place — the postings frame is a zero-shuffle projection (the old
    * `explode(tokens) → groupBy(term, id)` shipped every postings row
    * through an exchange just to merge partials that never overlap
    * across docs, and the separate `doclensOf` re-tokenized the corpus a
    * SECOND time). Doc length = Σtf over the same entries (= the
    * nonzero-token count, exactly `size(filter(tokens, len > 0))`; a
    * null text stays null through the fold). The slim (id, entries)
    * frame is eagerly localCheckpoint-ed: postings and doc lengths both
    * read it without re-reading or re-tokenizing the text. */
  private def tfEntries(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    Fan.spread(docs.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"),
        org.apache.spark.sql.graft.TextExpressionFunctions
          .tokenTfColumn(T.tokens(col("__t"))).as("__e"))
      .localCheckpoint()

  private def postingsOf(entries: DataFrame): DataFrame =
    entries.select(col("id"), explode(col("__e")).as("__x"))
      .select(col("__x.term").as("term"), col("id"), col("__x.tf").as("tf"))

  private def doclensOf(entries: DataFrame): DataFrame =
    entries.select(col("id"),
      aggregate(col("__e"), lit(0L), (acc, x) => acc + x.getField("tf"))
        .as("dl"))

  /** Build and persist the full inverted index: the one corpus-scale
    * text pass, amortized over every query that follows. */
  def save(
      wh: Warehouse,
      name: String,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val spark = wh.spark
    import spark.implicits._
    // a full rebuild supersedes any previous soft-deletes: stale
    // tombstones would silently erase re-admitted docs from the new index.
    // drop, not empty-overwrite: "no tombstones" needs no parquet write
    // job, and the query-side anti-join vanishes from the plan entirely
    if (wh.exists(tombTable(name))) wh.drop(tombTable(name))
    val entries = tfEntries(docs, textCol, idCol)
    wh.overwrite(name, postingsOf(entries))
    // the meta aggregates RIDE the doc-length write job (observe — the
    // connectedComponents zero-extra-job pattern); coalesce: sum(dl) is
    // NULL over an empty corpus — an empty index is legal (first build of
    // an incremental pipeline) and writes (0, 0)
    val obs = org.apache.spark.sql.Observation()
    wh.overwrite(dlTable(name), doclensOf(entries)
      .observe(obs, count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("s")))
    val m = obs.get
    wh.overwrite(metaTable(name),
      Seq((m("n").asInstanceOf[Long], m("s").asInstanceOf[Long]))
        .toDF("n_docs", "sum_dl"))
  }

  /** Append newly-admitted docs: tokenize the NEW text only, append
    * postings + lengths, bump the exact meta counts. Identical to a
    * rebuild because postings of distinct doc ids never collide and the
    * meta quantities are sums. (Re-adding an EXISTING id would double its
    * postings — gate admission upstream, e.g. [[Dedup.exact]]; a
    * TOMBSTONED id stays invisible until [[compact]] retires its
    * tombstone, so evict-then-readmit is compact → append.) */
  def append(
      wh: Warehouse,
      name: String,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val spark = wh.spark
    import spark.implicits._
    val entries = tfEntries(docs, textCol, idCol)
    wh.append(name, postingsOf(entries))
    // dls derives from the checkpointed entries, so the append and the
    // meta delta below see the same rows without a second checkpoint
    val dls = doclensOf(entries)
    wh.append(dlTable(name), dls)
    val delta = dls
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("s"))
      .collect()(0)
    val prev = wh.read(metaTable(name)).collect()(0)
    wh.overwrite(metaTable(name),
      Seq((prev.getLong(0) + delta.getLong(0),
        prev.getLong(1) + delta.getLong(1))).toDF("n_docs", "sum_dl"))
  }

  /** Delete admitted docs WITHOUT rebuilding: the Warehouse soft-delete
    * discipline applied to postings. Deleted ids land in a tombstone
    * table (`<name>__tomb`) and the exact meta counts drop by the
    * deleted docs' (count, Σdl) — so `avgdl`/`n_docs` are the REBUILT
    * corpus's numbers and [[bm25]] (which anti-joins the tombstones at
    * query time) scores BIT-IDENTICALLY to an index rebuilt without the
    * deleted docs (spec'd in `SparseIndexSpec`). Cost is one slim keyed
    * pass over the doc-length table; the postings files are untouched —
    * the dedup-then-reindex loop stays incremental in BOTH directions
    * (admit via [[append]], evict via this) and [[compact]] folds the
    * tombstones into the files when churn warrants it. Ids not in the
    * index (or already deleted) are ignored, so deletes are idempotent. */
  def delete(
      wh: Warehouse,
      name: String,
      ids: DataFrame,
      idCol: String = "doc_id"): Unit = {
    val spark = wh.spark
    import spark.implicits._
    val dl = wh.read(dlTable(name))
    val existing =
      if (wh.exists(tombTable(name))) wh.read(tombTable(name))
      else dl.select(col("id")).filter(lit(false))
    // only ids actually live in the index count against the meta —
    // checkpointed so the append and the meta delta see the same rows;
    // the delta aggregates ride the checkpoint's materialization job
    // (observe — no separate scan of the checkpointed frame)
    val obs = org.apache.spark.sql.Observation()
    val newTombs = dl
      .join(ids.select(col(idCol).as("id")).distinct(), Seq("id"), "left_semi")
      .join(existing, Seq("id"), "left_anti")
      .observe(obs, count(lit(1)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("s"))
      .localCheckpoint()
    val delta = obs.get
    val nNew = delta("n").asInstanceOf[Long]
    if (nNew == 0L) return
    // a small tombstone batch (count known from the observe) collects to
    // a LocalRelation so the overwrite takes the Warehouse driver-side
    // tiny-commit fast path — no Spark write job for a handful of ids
    // (optimization r18); large batches keep the distributed write
    val tombIds = newTombs.select("id")
    val tombOut =
      if (nNew <= Warehouse.LocalWriteMaxRows) {
        val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
        tombIds.collect().foreach(rows.add)
        spark.createDataFrame(rows, tombIds.schema)
      } else tombIds
    if (wh.exists(tombTable(name))) wh.append(tombTable(name), tombOut)
    else wh.overwrite(tombTable(name), tombOut)
    val prev = wh.read(metaTable(name)).collect()(0)
    wh.overwrite(metaTable(name),
      Seq((prev.getLong(0) - delta("n").asInstanceOf[Long],
        prev.getLong(1) - delta("s").asInstanceOf[Long])).toDF("n_docs", "sum_dl"))
  }

  /** Fold accumulated tombstones into the postings/doc-length files (one
    * copy-on-write rewrite of each) and clear the tombstone table — run
    * when the tombstone set has grown enough that the per-query
    * anti-join is worth retiring. Queries before/after compaction return
    * identical results (meta already reflects the deletes). */
  def compact(wh: Warehouse, name: String): Unit = {
    if (!wh.exists(tombTable(name))) return
    val tomb = wh.read(tombTable(name)).localCheckpoint()
    if (tomb.isEmpty) return
    wh.rewrite(name, _.join(broadcast(tomb), Seq("id"), "left_anti"))
    wh.rewrite(dlTable(name), _.join(broadcast(tomb), Seq("id"), "left_anti"))
    wh.overwrite(tombTable(name), tomb.filter(lit(false)))
  }

  /** Tombstone-filtered views of the stored frames (no-ops when nothing
    * was deleted — the broadcast anti-join only enters the plan when a
    * non-empty tombstone table exists). */
  private def tombstoned(wh: Warehouse, name: String, df: DataFrame): DataFrame =
    if (!wh.exists(tombTable(name))) df
    else df.join(broadcast(wh.read(tombTable(name))), Seq("id"), "left_anti")

  private def posTable(name: String): String = s"${name}__pos"

  /** Build and persist POSITIONAL postings — (term, id, positions
    * array<int>, 1-based over the empty-filtered token list, sorted) —
    * the tier that makes phrase queries answerable from the index
    * (Lucene's positions file, as a Warehouse table). Per-(term, doc)
    * position lists are bounded by document length, the same bound
    * every positional index carries; the corpus-scale cost is the one
    * tokenize pass, term-keyed like the tf postings. Shares the index's
    * tombstone table, so [[delete]] hides a doc from phrase queries the
    * same way it hides it from [[bm25]]. */
  def savePositional(
      wh: Warehouse,
      name: String,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val pos = Fan.spread(docs.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"),
        posexplode(filter(T.tokens(col("__t")), tk => length(tk) > 0))
          .as(Seq("__p", "term")))
      .groupBy(col("term"), col("id"))
      .agg(sort_array(collect_list(col("__p") + 1)).as("positions"))
    wh.overwrite(posTable(name), pos)
  }

  /** Exact phrase search over the positional postings: a document
    * matches when some position p holds term₀ with termᵢ at p+i for
    * every i — the classic positional-intersection query plan. Each
    * phrase term selects a SLIVER of the term-keyed positions table;
    * the slivers equi-join on doc id (k−1 slim joins for a k-word
    * phrase — the text column never enters the plan), and the
    * adjacency test is one row-local filter over the anchor term's
    * position list. Occurrence counts are exact integers and the
    * (n_occurrences desc, id) cut is a total order, so the result
    * replays exactly in SQL from the raw corpus.
    *
    * @return top-k (id, n_occurrences), n_occurrences >= 1 */
  def phraseSearch(
      wh: Warehouse,
      name: String,
      phrase: Seq[String],
      topK: Int = 10): DataFrame = {
    require(phrase.size >= 2, s"phrase needs >= 2 terms: $phrase")
    require(topK > 0, s"topK must be positive: $topK")
    val post = wh.read(posTable(name))
    val slivers = phrase.zipWithIndex.map { case (t, i) =>
      tombstoned(wh, name, post.filter(col("term") === t))
        .select(col("id"), col("positions").as(s"__p$i"))
    }
    val joined = slivers.reduce((a, b) => a.join(b, Seq("id")))
    val nOcc = size(filter(col("__p0"), p =>
      (1 until phrase.size)
        .map(i => array_contains(col(s"__p$i"), p + i))
        .reduce(_ && _)))
    joined.select(col("id"), nOcc.cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
      .orderBy(col("n_occurrences").desc, col("id"))
      .limit(topK)
  }

  /** BM25 top-k over the LOADED index — exactly
    * [[graft.operators.Curation.bm25Search]]'s expression tree (operand
    * order and all), fed from postings instead of text: the query's
    * terms select a sliver of the term-keyed postings, df/avgdl come
    * from the same aggregates, and the text column is never touched. */
  def bm25(
      wh: Warehouse,
      name: String,
      terms: Seq[String],
      topK: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && topK > 0, "need query terms and topK > 0")
    val meta = wh.read(metaTable(name)).collect() match {
      case Array(r) => (r.getLong(0), r.getLong(1))
      case rows => throw new IllegalStateException(
        s"index $name meta must have exactly 1 row, found ${rows.length}")
    }
    val (nDocs, sumDl) = meta
    val docLens = tombstoned(wh, name, wh.read(dlTable(name)))
    val tf = tombstoned(wh, name,
      wh.read(name).filter(col("term").isin(terms: _*)))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val joined = tf.join(broadcast(df), "term")
      .join(docLens, "id")
      .withColumn("n_docs", lit(nDocs))
      // same IEEE division the from-text scorer's sum/count agg performs
      .withColumn("avgdl", lit(sumDl.toDouble / nDocs.toDouble))
    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val nD = col("n_docs").cast("double")
    val bm25Idf = log(lit(1.0) + (nD - dfD + 0.5) / (dfD + 0.5))
    val contrib = bm25Idf * (tfD * (k1 + 1.0)) /
      (tfD + (lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / col("avgdl"))))
    joined
      .select(col("id"), col("term"), contrib.as("s"))
      .groupBy(col("id"))
      .agg(
        sort_array(collect_list(struct(col("term"), col("s")))).as("__xs"),
        count(lit(1)).as("n_hit_terms"))
      .select(col("id").as("doc_id"), col("n_hit_terms"),
        round(aggregate(col("__xs"), lit(0.0), (acc, x) => acc + x("s")), 6)
          .as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(topK)
  }
}
