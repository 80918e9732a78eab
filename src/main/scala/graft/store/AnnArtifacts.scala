package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Persistence for the ANN / dedup index artifacts — PQ codebooks, IVF
  * anchor sets, MinHash-LSH band indexes — as schema-stable [[Warehouse]]
  * tables.
  *
  * A corpus pipeline trains these ONCE and reuses them across jobs and
  * streams: the PQ codebook that encoded a 100 TB corpus must be the one
  * every later retrieval query loads (re-training yields different codes
  * and silently garbage ADC distances), and the admission stream's band
  * index must carry the banding parameters it was built with — band keys
  * hash the banding definition, so a parameter mismatch between index and
  * probe produces DISJOINT key spaces and a gate that admits everything.
  * Persisting the parameters WITH the index turns that silent trap into a
  * loud error ([[loadBandIndex]] validates on load).
  *
  * Storage shapes (all row-stable, no driver-side JSON blobs):
  *  - PQ codebook `<name>`: (sub INT, cid BIGINT, width INT, centroid ARRAY<FLOAT>)
  *  - anchors `<name>`: (aid BIGINT, embedding ARRAY<FLOAT>)
  *  - band index `<name>`: (id, band) + companion `<name>__meta`:
  *    (shingle_n INT, k INT, bands INT, tier STRING)
  */
object AnnArtifacts {

  // ---- PQ codebooks -------------------------------------------------

  def savePqCodebook(wh: Warehouse, name: String, cb: Similarity.PqCodebook): Unit = {
    val spark = wh.spark
    import spark.implicits._
    val rows = cb.books.zipWithIndex.flatMap { case (book, s) =>
      book.map { case (cid, cv) => (s, cid, cb.width, cv) }
    }
    wh.overwrite(name, rows.toDF("sub", "cid", "width", "centroid"))
  }

  def loadPqCodebook(wh: Warehouse, name: String): Similarity.PqCodebook = {
    val rows = wh.read(name)
      .select(col("sub").cast("int"), col("cid").cast("bigint"),
        col("width").cast("int"), col("centroid"))
      .collect()
    require(rows.nonEmpty, s"PQ codebook $name is empty")
    val width = rows.head.getInt(2)
    val bySub = rows.groupBy(_.getInt(0))
    val m = bySub.keySet.max + 1
    require(bySub.keySet == (0 until m).toSet,
      s"PQ codebook $name has gaps in its subspace ids")
    Similarity.PqCodebook(width, (0 until m).map { s =>
      bySub(s).map(r => (r.getLong(1), r.getSeq[Float](3))).sortBy(_._1).toSeq
    })
  }

  // ---- IVF / cell anchors -------------------------------------------

  def saveAnchors(wh: Warehouse, name: String, anchors: Seq[(Long, Seq[Float])]): Unit = {
    val spark = wh.spark
    import spark.implicits._
    wh.overwrite(name, anchors.toDF("aid", "embedding"))
  }

  def loadAnchors(wh: Warehouse, name: String): Seq[(Long, Seq[Float])] =
    wh.read(name).select(col("aid").cast("bigint"), col("embedding"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)

  // ---- MinHash-LSH band indexes -------------------------------------

  /** The banding parameters an index was built with; persisted alongside
    * the band rows and validated on load. */
  final case class BandIndexMeta(shingleN: Int, k: Int, bands: Int, tier: Dedup.HashTier)

  private def tierName(t: Dedup.HashTier): String = t match {
    case Dedup.PortableMd5 => "md5"
    case Dedup.FastXx => "xx"
  }

  private def tierOf(s: String): Dedup.HashTier = s match {
    case "md5" => Dedup.PortableMd5
    case "xx" => Dedup.FastXx
    case other => throw new IllegalArgumentException(s"unknown hash tier: $other")
  }

  private def metaTable(name: String): String = s"${name}__meta"

  /** Build and persist the corpus band index ([[Dedup.bandKeys]] over
    * `docs`) plus its parameter row. The index is the slim (id, band)
    * frame a 100 TB corpus exposes so incremental admission never
    * re-shingles the corpus. */
  def saveBandIndex(
      wh: Warehouse,
      name: String,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      meta: BandIndexMeta = BandIndexMeta(5, 16, 8, Dedup.PortableMd5)): Unit = {
    val spark = wh.spark
    import spark.implicits._
    wh.overwrite(name,
      Dedup.bandKeys(docs, textCol, idCol, meta.shingleN, meta.k, meta.bands, meta.tier))
    wh.overwrite(metaTable(name),
      Seq((meta.shingleN, meta.k, meta.bands, tierName(meta.tier)))
        .toDF("shingle_n", "k", "bands", "tier"))
  }

  /** Load a band index and its parameters. `expected` (when given) is
    * validated against the persisted parameters — the loud version of the
    * disjoint-key-space trap. */
  def loadBandIndex(
      wh: Warehouse,
      name: String,
      expected: Option[BandIndexMeta] = None): (DataFrame, BandIndexMeta) = {
    val m = wh.read(metaTable(name)).collect() match {
      case Array(r) => BandIndexMeta(
        r.getAs[Int]("shingle_n"), r.getAs[Int]("k"), r.getAs[Int]("bands"),
        tierOf(r.getAs[String]("tier")))
      case rows => throw new IllegalStateException(
        s"band index $name meta must have exactly 1 row, found ${rows.length}")
    }
    expected.foreach { e =>
      require(e == m,
        s"band index $name was built with $m but the caller expects $e — " +
          "mismatched banding parameters produce disjoint key spaces and a " +
          "gate that admits everything")
    }
    (wh.read(name), m)
  }

  // ---- kNN graph edges ----------------------------------------------

  /** The build parameters a kNN edge frame was computed with; persisted
    * alongside the edges and validated on load — a graph consumer that
    * assumes k=10 edges from a k=3 build silently computes on a sparser
    * topology than it thinks. */
  final case class KnnGraphMeta(k: Int, nAnchors: Int, maxCellSize: Int)

  /** Build ([[Similarity.knnGraph]]) and persist the (src, dst, cosine)
    * edge frame plus its parameter row. The graph algorithms (PageRank,
    * label propagation, triangle counting) all consume the SAME edge
    * topology, and the stress record shows the cell-blocked graph BUILD
    * dominates each of them — a pipeline builds the edges once per corpus
    * version and lets every downstream graph query load-then-compute
    * (the codebook/anchors contract, applied to topology). */
  def saveKnnGraph(
      wh: Warehouse,
      name: String,
      corpus: DataFrame,
      anchors: Seq[(Long, Seq[Float])],
      k: Int,
      vecCol: String = "embedding",
      idCol: String = "vec_id",
      maxCellSize: Int = 100000): Unit = {
    val spark = wh.spark
    import spark.implicits._
    wh.overwrite(name,
      Similarity.knnGraph(corpus, anchors, k, vecCol, idCol, maxCellSize)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"),
          col("cosine")))
    wh.overwrite(metaTable(name),
      Seq((k, anchors.size, maxCellSize)).toDF("k", "n_anchors", "max_cell_size"))
  }

  /** Load a persisted kNN edge frame and its build parameters;
    * `expected` (when given) is validated against them. */
  def loadKnnGraph(
      wh: Warehouse,
      name: String,
      expected: Option[KnnGraphMeta] = None): (DataFrame, KnnGraphMeta) = {
    val m = wh.read(metaTable(name)).collect() match {
      case Array(r) => KnnGraphMeta(
        r.getAs[Int]("k"), r.getAs[Int]("n_anchors"),
        r.getAs[Int]("max_cell_size"))
      case rows => throw new IllegalStateException(
        s"kNN graph $name meta must have exactly 1 row, found ${rows.length}")
    }
    expected.foreach { e =>
      require(e == m,
        s"kNN graph $name was built with $m but the caller expects $e — " +
          "a topology/parameter mismatch silently changes every downstream " +
          "graph result")
    }
    (wh.read(name), m)
  }

  /** Append freshly-admitted documents' band keys to a persisted index —
    * the post-admission step that keeps the gate's corpus view current
    * without ever re-shingling old data. */
  def appendToBandIndex(
      wh: Warehouse,
      name: String,
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val (_, m) = loadBandIndex(wh, name)
    wh.append(name,
      Dedup.bandKeys(docs, textCol, idCol, m.shingleN, m.k, m.bands, m.tier))
  }
}
