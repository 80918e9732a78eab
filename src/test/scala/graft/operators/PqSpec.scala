package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  behavior of "NearestCellL2F"

  it should "pick the argmin-L2 anchor over the configured slice with ties to the smallest id" in {
    val d = Seq(
      (1L, Seq(0f, 0f, 5f, 5f)), // slice [0,2): near (0,0); slice [2,4): near (5,5)
      (2L, Seq(1f, 1f, 0f, 0f))  // slice [0,2): EXACT tie between anchors -> cid 0
    ).toDF("id", "v")
    val aids = Array(0L, 1L)
    val anchors = Array(Array(0f, 2f), Array(2f, 0f)) // both at L2²=2 from (1,1)
    def cell(off: Int) = org.apache.spark.sql.graft.GraftFunctions
      .nearestCellL2Column(col("v"), aids, anchors, off, 2)
    val r = d.select(col("id"), cell(0).as("c0"), cell(2).as("c2"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    r(2L)._1 shouldBe 0L // exact tie -> smallest aid
    // doc 1 slice [2,4) = (5,5): dist² to (0,2)=25+9=34, to (2,0)=9+25=34 -> tie -> 0
    r(1L)._2 shouldBe 0L
  }

  behavior of "product quantization"

  private def naiveEncode(
      vecs: Seq[(Long, Seq[Float])],
      cb: Similarity.PqCodebook): Map[Long, Seq[Int]] =
    vecs.map { case (id, v) =>
      id -> cb.books.zipWithIndex.map { case (book, s) =>
        book.sortBy(_._1).map { case (cid, cv) =>
          var d = 0.0
          var j = 0
          while (j < cb.width) {
            val x = if (s * cb.width + j < v.length) v(s * cb.width + j).toDouble else 0.0
            val c = if (j < cv.length) cv(j).toDouble else 0.0
            d += (x - c) * (x - c)
            j += 1
          }
          (d, cid)
        }.minBy(identity)._2.toInt
      }
    }.toMap

  it should "encode exactly like the naive per-slice argmin on random vectors" in {
    val rnd = new Random(7)
    val dim = 16
    val vecs = (1L to 100L).map(id => (id, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainSeed(df, m = 4, kPerSub = 8, dim = dim)
    val got = Similarity.pqEncode(df, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    got shouldBe naiveEncode(vecs, cb)
  }

  it should "score ADC exactly like the naive reference and rank by (adc, id)" in {
    val rnd = new Random(11)
    val dim = 16
    val vecs = (1L to 80L).map(id => (id, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrainSeed(df, m = 4, kPerSub = 8, dim = dim)
    val codes = naiveEncode(vecs, cb)
    val queries = vecs.filter(_._1 <= 3)
    val expected = queries.flatMap { case (qid, qv) =>
      // per-(sub, cid) partial distances, then ascending-sub fold per doc
      val dt = cb.books.zipWithIndex.map { case (book, s) =>
        book.sortBy(_._1).map { case (cid, cv) =>
          var d = 0.0
          var j = 0
          while (j < cb.width) {
            val x = if (s * cb.width + j < qv.length) qv(s * cb.width + j).toDouble else 0.0
            val c = if (j < cv.length) cv(j).toDouble else 0.0
            d += (x - c) * (x - c)
            j += 1
          }
          cid.toInt -> d
        }.toMap
      }
      vecs.filter(_._1 != qid).map { case (nid, _) =>
        val adc = codes(nid).zipWithIndex
          .foldLeft(0.0) { case (acc, (code, s)) => acc + dt(s)(code) }
        (qid, nid, adc)
      }.sortBy(x => (x._3, x._2)).take(4)
    }.toSet
    val got = Similarity.pqTopK(df, df.filter(col("vec_id") <= 3), cb, k = 4)
      .select("query_id", "neighbor_id", "adc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    got shouldBe expected
  }

  it should "retrieve with useful recall under a Lloyd-refined codebook" in {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = Similarity.pqTrainKmeans(e, m = 8, kPerSub = 16, dim = 64, iters = 2)
    val queries = e.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(e, queries, cb, k = 10)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact L2 top-10 as ground truth
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val l2 = expr(
      """aggregate(zip_with(qv, cv, (a, b) -> (CAST(a AS DOUBLE) - b) *
        |(CAST(a AS DOUBLE) - b)), 0D, (acc, x) -> acc + x)""".stripMargin)
    val exact = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), l2.as("d"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("d").asc, col("neighbor_id").asc)))
      .filter(col("rank") <= 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.keys.toSeq.map { qid =>
      pq.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / 10.0
    }
    val mean = recalls.sum / recalls.size
    // near-random 64-dim data is PQ's worst case (no cluster structure
    // for ANY training metric to exploit — observed 0.19-0.29 across
    // codebook variants, ±1 neighbor of noise on 10 queries); codes-only
    // retrieval is the candidate tier, not the final ranking (see the
    // rerank test, which owns the meaningful floor)
    withClue(s"mean ADC-only recall@10 = $mean: ") { mean should be >= 0.15 }

    // ADC shortlist + exact re-rank: the production read path
    val rr = Similarity.pqTopKRerank(e, queries, cb, k = 10, shortlist = 100)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rrRecalls = exact.keys.toSeq.map { qid =>
      rr.getOrElse(qid, Set.empty).intersect(exact(qid)).size.toDouble / 10.0
    }
    val rrMean = rrRecalls.sum / rrRecalls.size
    withClue(s"mean rerank recall@10 = $rrMean: ") { rrMean should be >= 0.6 }
    withClue("re-ranking must not lose recall vs codes-only: ") {
      rrMean should be >= mean
    }
  }

  behavior of "IVF-PQ"

  it should "assign cells and float residuals exactly like the naive reference" in {
    val rnd = new Random(23)
    val dim = 8
    val vecs = (1L to 60L).map(id => (id, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val anchors = vecs.take(3).map { case (id, v) => (id - 1, v) }
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.ivfResiduals(df, anchors)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Float](2))).toMap
    vecs.foreach { case (id, v) =>
      val (cell, _) = anchors.map { case (aid, av) =>
        val d = av.indices.map(j => (v(j).toDouble - av(j).toDouble)).map(x => x * x).sum
        (aid, d)
      }.minBy { case (aid, d) => (d, aid) }
      val expectedRv = v.zip(anchors.find(_._1 == cell).get._2).map { case (x, a) => x - a }
      val (gotCell, gotRv) = got(id)
      withClue(s"vec $id: ") {
        gotCell shouldBe cell
        gotRv shouldBe expectedRv
      }
    }
  }

  it should "retrieve with IVFADC restricted to probed cells, deterministically" in {
    val rnd = new Random(29)
    val dim = 16
    val vecs = (1L to 120L).map(id => (id, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val df = vecs.toDF("vec_id", "embedding")
    val anchors = vecs.take(4).map { case (id, v) => (id - 1, v) }
    val res = Similarity.ivfResiduals(df, anchors)
    val cb = Similarity.pqTrainSeed(res, m = 4, kPerSub = 8, dim = dim, vecCol = "rv")
    val queries = df.filter(col("vec_id") <= 3)
    val r1 = Similarity.ivfPqTopK(df, queries, anchors, cb, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val r2 = Similarity.ivfPqTopK(df, queries, anchors, cb, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    r1.toSeq.sorted shouldBe r2.toSeq.sorted
    // every query returns exactly k ranked rows, self excluded
    val byQ = r1.groupBy(_._1)
    byQ.keySet shouldBe Set(1L, 2L, 3L)
    byQ.values.foreach { rows =>
      rows.length shouldBe 5
      rows.map(_._4).sorted shouldBe (1 to 5)
      rows.foreach { case (q, n, _, _) => n should not be q }
    }
    // candidates come only from probed cells: with nProbe = all cells the
    // candidate pool is the whole corpus, so the result ranks >= as many
    // true L2 neighbors (structural sanity, exactness is the oracle's job)
    val all = Similarity.ivfPqTopK(df, queries, anchors, cb, k = 5,
      nProbe = anchors.size)
    all.groupBy(col("query_id")).count().collect()
      .foreach(_.getLong(1) shouldBe 5L)
  }
}
