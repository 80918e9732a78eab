package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Random-data parity: the distributed operators must agree EXACTLY
  * (bit-for-bit doubles) with naive single-threaded reference
  * implementations on seeded random corpora — the guard that the
  * fixture-oracle checks can't provide for shapes the fixture lacks. */
class QualityParitySpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def mkCorpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a")
    (1L to nDocs).map { id =>
      val n = rnd.nextInt(30) // includes 0- and 1-token docs
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  "lmScore" should "match a naive bigram-LM reference on random corpora" in {
    val corpus = mkCorpus(seed = 17, nDocs = 60)
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val bigrams = toks.view.mapValues(ts => ts.zip(ts.drop(1))).toMap
    val cb = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val cu = bigrams.values.flatten.groupBy(_._1).view.mapValues(_.size).toMap
    val v = toks.values.flatten.toSet.size
    val expected = bigrams.collect { case (id, bs) if bs.nonEmpty =>
      val lnps = bs.map { b => math.log((cb(b) + 1.0) / (cu(b._1) + v.toDouble)) }
      id -> (bs.size.toLong, r6(-lnps.foldLeft(0.0)(_ + _) / bs.size.toDouble))
    }
    val got = Quality.lmScore(corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    got shouldBe expected
  }

  "bm25Search" should "match a naive BM25 reference on random corpora" in {
    val corpus = mkCorpus(seed = 23, nDocs = 80)
    val terms = Seq("alpha", "zeta", "the")
    val k1 = 1.2; val b = 0.75
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val dls = toks.view.mapValues(_.size.toLong).toMap
    val nDocs = corpus.size
    val avgdl = dls.values.sum.toDouble / nDocs
    val tf = toks.toSeq.flatMap { case (id, ts) =>
      ts.filter(terms.contains).groupBy(identity).map { case (t, o) => (id, t, o.size) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.size).toMap
    val perDoc = tf.groupBy(_._1).map { case (id, hits) =>
      val contribs = hits.sortBy(_._2).map { case (_, term, f) =>
        val idf = math.log(1.0 + (nDocs.toDouble - df(term).toDouble + 0.5) / (df(term).toDouble + 0.5))
        idf * (f.toDouble * (k1 + 1.0)) /
          (f.toDouble + (k1 * ((1.0 - b) + (b * dls(id).toDouble) / avgdl)))
      }
      (id, hits.size.toLong, r6(contribs.foldLeft(0.0)(_ + _)))
    }.toSeq
    val expected = perDoc.sortBy(x => (-x._3, x._1)).take(10)
    val got = Curation.bm25Search(corpus.toDF("doc_id", "text"), terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe expected
  }

  "semanticDedup" should "match a naive within-cell reference on random vectors" in {
    val rnd = new Random(31)
    val dim = 8
    val vecs = (1L to 120L).map { id =>
      (id, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }
    val anchors = vecs.take(4).map { case (id, v) => (id, v) }
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))
    def cellOf(v: Seq[Float]): Long = {
      val nv = norm(v)
      anchors.map { case (aid, av) => (-(dot(v, av) / (nv * norm(av))), aid) }
        .minBy(identity)._2
    }
    val cells = vecs.map { case (id, v) => id -> cellOf(v) }.toMap
    val threshold = 0.5
    val losers = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cells(ia) == cells(ib) &&
        dot(va, vb) / (norm(va) * norm(vb)) >= threshold
    } yield ib).toSet
    val expected = vecs.map { case (id, _) => id -> (cells(id), !losers(id)) }.toMap
    val got = Dedup.semanticDedup(
      vecs.toDF("vec_id", "embedding"), anchors, threshold)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    got shouldBe expected
  }

  "semanticDedupKeepBest" should "match a naive dominance reference on random vectors" in {
    val rnd = new Random(47)
    val dim = 8
    val vecs = (1L to 120L).map { id =>
      (id, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f), (id * 37L) % 50L)
    }
    val anchors = vecs.take(4).map { case (id, v, _) => (id, v) }
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    def norm(a: Seq[Float]): Double = math.sqrt(dot(a, a))
    def cellOf(v: Seq[Float]): Long = {
      val nv = norm(v)
      anchors.map { case (aid, av) => (-(dot(v, av) / (nv * norm(av))), aid) }
        .minBy(identity)._2
    }
    val cells = vecs.map { case (id, v, _) => id -> cellOf(v) }.toMap
    val score = vecs.map { case (id, _, q) => id -> q }.toMap
    val threshold = 0.5
    // naive dominance: b loses to a when same cell, cosine >= t, and a
    // beats b on (score desc, id asc) — evaluated over ALL pairs
    val losers = (for {
      (ia, va, _) <- vecs; (ib, vb, _) <- vecs
      if ia != ib && cells(ia) == cells(ib) &&
        dot(va, vb) / (norm(va) * norm(vb)) >= threshold &&
        (score(ia) > score(ib) || (score(ia) == score(ib) && ia < ib))
    } yield ib).toSet
    val expected = vecs.map { case (id, _, _) =>
      id -> (cells(id), !losers(id)) }.toMap
    val got = Dedup.semanticDedupKeepBest(
      vecs.toDF("vec_id", "embedding", "q"), anchors, threshold, "q")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    got shouldBe expected
  }
}
