package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and encoding, Spark-shaped.
  *
  * The classic algorithm iterates "count adjacent symbol pairs → merge
  * the most frequent" — naively a corpus-wide pass per merge. The
  * scalable formulation exploits that BPE statistics are a function of
  * the WORD-FREQUENCY table, not the token stream: the corpus is read
  * once to build (word, freq) — vocabulary-sized, orders of magnitude
  * smaller than the corpus — and every merge iteration runs on that
  * small frame only. Encoding then never re-runs BPE at all: training
  * yields each known word's final segmentation, so corpus encoding is a
  * broadcast join token→subwords with a character fallback for unseen
  * words (the standard train-on-vocab / encode-by-lookup trick).
  *
  * Plan notes: the per-iteration pair counting is the codegen'd
  * explode(sequence)+element_at shape (no interpreted HOF in the
  * counting); the merge APPLICATION uses an `aggregate` fold over the
  * symbol array — interpreted, but it touches only the vocab table, off
  * the corpus-scale hot path. Each iteration truncates lineage with an
  * eager `localCheckpoint` (the iterative-plan policy used by
  * connectedComponents), and the argmax collects exactly ONE row per
  * iteration. Determinism: pair ties break lexicographically.
  */
object Bpe {

  final case class Trained(
      merges: Seq[(String, String)],
      segmentations: DataFrame) // (word, freq, syms: array<string>)

  /** Word-frequency table of a corpus: the single corpus-scale pass. */
  def wordFrequencies(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** One left-to-right non-overlapping merge pass of (a, b) → a+b over a
    * symbol array, as a fold: append each symbol unless it is `b` and the
    * accumulator currently ends in `a` — then fuse. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      lit(Array.empty[String]),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(element_at(acc, -1), x))))
        .otherwise(concat(acc, array(x))))

  /** Train `nMerges` merges. Stops early when no adjacent pair occurs at
    * least `minPairFreq` times.
    *
    * Hybrid execution (the same policy as `connectedComponents`' driver
    * union-find finish): BPE statistics live on the word-frequency table,
    * and when that vocabulary fits the driver (`maxDriverWords`), the
    * merge loop runs in memory in one job-free pass — which is how
    * production BPE trainers work. A larger vocabulary falls back to the
    * distributed per-merge loop (pair count → argmax → fold-merge), one
    * small Spark job pair per merge. Both paths produce identical merges
    * and segmentations (spec'd against each other); ties break
    * lexicographically in both. */
  def train(
      docs: DataFrame,
      nMerges: Int,
      minPairFreq: Long = 2L,
      textCol: String = "text",
      idCol: String = "doc_id",
      maxDriverWords: Long = 1000000L): Trained = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val wf = wordFrequencies(docs, textCol, idCol)
    // size probe and driver copy in one action: ≤ maxDriverWords+1 rows
    val probe = wf.limit(math.min(maxDriverWords + 1, Int.MaxValue.toLong).toInt).collect()
    if (probe.length <= maxDriverWords) {
      val spark = docs.sparkSession
      import spark.implicits._
      val (merges, segs) = trainOnDriver(
        probe.map(r => (r.getString(0), r.getLong(1))), nMerges, minPairFreq)
      return Trained(merges,
        segs.toSeq.toDF("word", "freq", "syms"))
    }
    var seg = wf
      .select(col("word"), col("freq"),
        split(col("word"), "").as("syms"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      // codegen'd pair stream: explode the positions, element_at the ends.
      // Single-symbol words are filtered FIRST: sequence(1, 0) would
      // descend ([1, 0]) rather than come back empty.
      val top = seg
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("j"))
        .select(col("freq"),
          element_at(col("syms"), col("j")).as("a"),
          element_at(col("syms"), col("j") + 1).as("b"))
        .groupBy("a", "b")
        .agg(sum(col("freq")).as("w"))
        .orderBy(desc("w"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      top.headOption.filter(_.getLong(2) >= minPairFreq) match {
        case Some(row) =>
          val (a, b) = (row.getString(0), row.getString(1))
          merges += ((a, b))
          // the superseded iteration frame becomes unreachable here; its
          // checkpoint blocks are reclaimed by the ContextCleaner
          // (Dataset.unpersist would be a no-op: it only touches the SQL
          // cache, never checkpoint block storage)
          seg = seg.select(col("word"), col("freq"),
            applyMerge(col("syms"), a, b).as("syms"))
            .localCheckpoint()
          i += 1
        case None => exhausted = true
      }
    }
    Trained(merges.result(), seg)
  }

  /** In-memory merge loop over the collected (word, freq) table —
    * semantics identical to the distributed loop. */
  private def trainOnDriver(
      words: Array[(String, Long)],
      nMerges: Int,
      minPairFreq: Long): (Seq[(String, String)], Array[(String, Long, Seq[String])]) = {
    var segs: Array[Vector[String]] =
      words.map(_._1.split("").toVector)
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var k = 0
      while (k < segs.length) {
        val s = segs(k); val f = words(k)._2
        var j = 0
        while (j < s.length - 1) {
          counts.updateWith((s(j), s(j + 1)))(c => Some(c.getOrElse(0L) + f))
          j += 1
        }
        k += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), w) = counts.minBy { case ((a, b), w) => (-w, a, b) }
        if (w < minPairFreq) exhausted = true
        else {
          merges += ((a, b))
          segs = segs.map(applyMergeDriver(_, a, b))
          i += 1
        }
      }
    }
    (merges.result(),
      words.zip(segs).map { case ((w, f), s) => (w, f, s: Seq[String]) })
  }

  /** Driver twin of [[applyMerge]]: greedy left-to-right fuse. */
  private def applyMergeDriver(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    s.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b)
        out(out.length - 1) = a + b
      else out += x
    }
    out.toVector
  }

  /** Encode a corpus with a trained segmentation table: tokenize, join
    * each token against the broadcast word→subwords lookup, fall back to
    * single characters for out-of-vocabulary words. Output one row per
    * (doc, token position): (idCol, pos, word, subwords, n_subwords).
    *
    * At 100 TB the corpus side never shuffles: the segmentation table is
    * vocabulary-sized (AQE broadcasts it; the explicit hint pins the
    * build side), and everything else is a projection. */
  def encode(
      docs: DataFrame,
      trained: Trained,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = Fan.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        posexplode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    toks
      .join(broadcast(trained.segmentations.select(col("word"), col("syms"))),
        Seq("word"), "left")
      .select(col(idCol), col("pos"), col("word"),
        coalesce(col("syms"), split(col("word"), "")).as("subwords"))
      .withColumn("n_subwords", size(col("subwords")).cast("bigint"))
  }
}
