package graft.store

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Persistence for trained tokenizer artifacts — the third leg of the
  * build-once/query-many family ([[AnnArtifacts]] for ANN/dedup,
  * [[SparseIndex]] for sparse retrieval): a production pipeline trains
  * BPE once per corpus version and every encode job afterwards loads the
  * SAME merges/segmentations (retraining yields a different vocabulary
  * and silently changes every token count downstream).
  *
  * Storage: `<name>` segmentations (word, freq, syms) — the broadcast
  * lookup encode actually uses — plus `<name>__merges` (ord, a, b)
  * preserving merge order, which IS the tokenizer definition (applying
  * the same merges in a different order yields different segmentations).
  */
object TokenizerArtifacts {

  private def mergesTable(name: String): String = s"${name}__merges"

  def saveBpe(wh: Warehouse, name: String, trained: Bpe.Trained): Unit = {
    val spark = wh.spark
    import spark.implicits._
    wh.overwrite(name, trained.segmentations
      .select(col("word"), col("freq").cast("long").as("freq"), col("syms")))
    wh.overwrite(mergesTable(name),
      trained.merges.zipWithIndex
        .map { case ((a, b), i) => (i, a, b) }
        .toDF("ord", "a", "b"))
  }

  def loadBpe(wh: Warehouse, name: String): Bpe.Trained = {
    val merges = wh.read(mergesTable(name))
      .select(col("ord").cast("int"), col("a"), col("b"))
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Bpe.Trained(merges, wh.read(name))
  }
}
