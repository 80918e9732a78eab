package graft.store

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Curation

class SparseIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshWh = new Warehouse(spark,
    Files.createTempDirectory("sparse_index").toString)

  private lazy val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "vector search with spark vector kernels"),
    (3L, "customer orders join customer accounts"),
    (4L, "totally unrelated text about gardens"),
    (5L, "spark spark spark everywhere spark")
  ).toDF("doc_id", "text")

  private val terms = Seq("spark", "vector", "customer")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  "SparseIndex" should "score a loaded index bit-identically to the from-text scorer" in {
    val wh = freshWh
    SparseIndex.save(wh, "ix", corpus)
    val viaIndex = rows(SparseIndex.bm25(wh, "ix", terms, topK = 10))
    val viaText = rows(Curation.bm25Search(corpus, terms, topK = 10))
    viaIndex shouldBe viaText
    viaIndex should not be empty
  }

  it should "make append-then-query equal rebuild-then-query exactly" in {
    val first = corpus.filter($"doc_id" <= 3)
    val delta = corpus.filter($"doc_id" > 3)
    val whInc = freshWh
    SparseIndex.save(whInc, "ix", first)
    SparseIndex.append(whInc, "ix", delta)
    val whFull = freshWh
    SparseIndex.save(whFull, "ix", corpus)
    rows(SparseIndex.bm25(whInc, "ix", terms, topK = 10)) shouldBe
      rows(SparseIndex.bm25(whFull, "ix", terms, topK = 10))
    // and the incremental index still matches the from-text scorer
    rows(SparseIndex.bm25(whInc, "ix", terms, topK = 10)) shouldBe
      rows(Curation.bm25Search(corpus, terms, topK = 10))
  }

  it should "make delete-then-query equal rebuild-then-query exactly" in {
    val whDel = freshWh
    SparseIndex.save(whDel, "ix", corpus)
    SparseIndex.delete(whDel, "ix", Seq(2L, 5L).toDF("doc_id"))
    val whRe = freshWh
    SparseIndex.save(whRe, "ix", corpus.filter($"doc_id" =!= 2 && $"doc_id" =!= 5))
    val afterDelete = rows(SparseIndex.bm25(whDel, "ix", terms, topK = 10))
    afterDelete shouldBe rows(SparseIndex.bm25(whRe, "ix", terms, topK = 10))
    afterDelete.map(_._1) should not contain 2L
    afterDelete.map(_._1) should not contain 5L
    // ...and the from-text scorer over the surviving corpus agrees
    afterDelete shouldBe rows(Curation.bm25Search(
      corpus.filter($"doc_id" =!= 2 && $"doc_id" =!= 5), terms, topK = 10))

    // deletes are idempotent and ignore unknown ids
    SparseIndex.delete(whDel, "ix", Seq(2L, 999L).toDF("doc_id"))
    rows(SparseIndex.bm25(whDel, "ix", terms, topK = 10)) shouldBe afterDelete

    // compaction folds tombstones into the files without changing results
    SparseIndex.compact(whDel, "ix")
    rows(SparseIndex.bm25(whDel, "ix", terms, topK = 10)) shouldBe afterDelete

    // the index stays incremental in BOTH directions: append after delete
    SparseIndex.append(whDel, "ix", Seq((6L, "spark customer gardens")).toDF("doc_id", "text"))
    val whRe2 = freshWh
    SparseIndex.save(whRe2, "ix",
      corpus.filter($"doc_id" =!= 2 && $"doc_id" =!= 5)
        .union(Seq((6L, "spark customer gardens")).toDF("doc_id", "text")))
    rows(SparseIndex.bm25(whDel, "ix", terms, topK = 10)) shouldBe
      rows(SparseIndex.bm25(whRe2, "ix", terms, topK = 10))
  }

  it should "build an empty index as (0, 0) meta instead of throwing" in {
    val wh = freshWh
    SparseIndex.save(wh, "ix", corpus.filter($"doc_id" < 0))
    wh.read("ix__meta").collect()(0).toSeq shouldBe Seq(0L, 0L)
    // an append of real docs then bootstraps it
    SparseIndex.append(wh, "ix", corpus)
    rows(SparseIndex.bm25(wh, "ix", terms, topK = 10)) shouldBe
      rows(Curation.bm25Search(corpus, terms, topK = 10))
  }

  it should "never read the text column at query time" in {
    val wh = freshWh
    SparseIndex.save(wh, "ix", corpus)
    val plan = SparseIndex.bm25(wh, "ix", terms, topK = 10)
      .queryExecution.executedPlan.toString
    plan should not include "text"
    // the postings scan is term-filtered (only the query's sliver reads)
    plan should include("term")
  }

  "TokenizerArtifacts" should "round-trip a trained BPE that encodes identically" in {
    val wh = freshWh
    val trained = graft.operators.Bpe.train(corpus, nMerges = 8, minPairFreq = 1L)
    TokenizerArtifacts.saveBpe(wh, "bpe", trained)
    val loaded = TokenizerArtifacts.loadBpe(wh, "bpe")
    loaded.merges shouldBe trained.merges
    def enc(t: graft.operators.Bpe.Trained) =
      graft.operators.Bpe.encode(corpus, t)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"),
          r.getAs[Seq[String]]("subwords"))).toSet
    enc(loaded) shouldBe enc(trained)
  }

  behavior of "phraseSearch"

  private lazy val phraseCorpus = Seq(
    (1L, "alpha beta gamma"), // one "alpha beta"
    (2L, "alpha beta alpha beta delta"), // two
    (3L, "beta alpha"), // reversed: no match
    (4L, "alpha gap beta"), // non-adjacent: no match
    (5L, "alpha beta gamma delta") // trigram lives here
  ).toDF("doc_id", "text")

  it should "count exact adjacent occurrences and support longer phrases" in {
    val wh = freshWh
    SparseIndex.savePositional(wh, "px", phraseCorpus)
    val got = SparseIndex.phraseSearch(wh, "px", Seq("alpha", "beta"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(2L -> 2L, 1L -> 1L, 5L -> 1L)
    val tri = SparseIndex.phraseSearch(wh, "px",
      Seq("alpha", "beta", "gamma"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    tri shouldBe Map(1L -> 1L, 5L -> 1L)
    // a 4-gram discriminates doc 5 from doc 1
    SparseIndex.phraseSearch(wh, "px",
      Seq("alpha", "beta", "gamma", "delta"))
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(5L)
  }

  it should "hide tombstoned docs like the bm25 leg does" in {
    val wh = freshWh
    SparseIndex.save(wh, "px2", phraseCorpus) // tombstones ride the index
    SparseIndex.savePositional(wh, "px2", phraseCorpus)
    SparseIndex.delete(wh, "px2", Seq(2L).toDF("doc_id"))
    val got = SparseIndex.phraseSearch(wh, "px2", Seq("alpha", "beta"))
      .collect().map(_.getLong(0)).toSet
    got shouldBe Set(1L, 5L)
  }
}
