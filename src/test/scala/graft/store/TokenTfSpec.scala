package graft.store

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{aggregate, col, count, explode, lit, sort_array}

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

/** Pins the r17 native row-local (term, tf) kernel — the zero-shuffle
  * inverted-index build path of [[SparseIndex]] — to the declarative
  * `explode(tokens) → filter(len > 0) → groupBy(term, id) → count`
  * formulation it replaced, and the Σtf doc length to
  * `size(filter(tokens, len > 0))`. */
class TokenTfSpec extends SparkSpec {
  import spark.implicits._

  private def crafted = Seq[(Long, String)](
    (1L, "the quick brown fox the quick THE Quick"),
    (2L, "aaaa"),
    (3L, ""),
    (4L, "   \t\n  "),
    (5L, null),
    (6L, "héllo wörld HÉLLO wörld 中文 中文 中文"),
    (7L, "one"),
    (8L, "x y z x y x")
  ).toDF("doc_id", "text")

  private def corpora = Seq(
    crafted,
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(80))

  "TokenTfEntries (native)" should "match explode→groupBy→count exactly" in {
    for (docs <- corpora) {
      val native = docs.select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressionFunctions
          .tokenTfColumn(T.tokens(col("text"))).as("__e"))
        .select(col("doc_id"), explode(col("__e")).as("__x"))
        .select(col("__x.term").as("term"), col("doc_id"), col("__x.tf").as("tf"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val spec = docs
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
        .filter(F.length(col("term")) > 0)
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      native shouldBe spec
    }
  }

  it should "emit entries in unsigned-byte term order" in {
    val ordered = crafted.select(
      org.apache.spark.sql.graft.TextExpressionFunctions
        .tokenTfColumn(T.tokens(col("text"))).as("__e"))
      .filter(col("__e").isNotNull)
      .select(col("__e"), sort_array(col("__e")).as("__s"))
      .collect()
    ordered should not be empty
    ordered.foreach(r => r.getSeq[Any](0) shouldBe r.getSeq[Any](1))
  }

  it should "fold to the exact declarative doc length (null text stays null)" in {
    for (docs <- corpora) {
      val native = docs.select(col("doc_id"),
        org.apache.spark.sql.graft.TextExpressionFunctions
          .tokenTfColumn(T.tokens(col("text"))).as("__e"))
        .select(col("doc_id"),
          aggregate(col("__e"), lit(0L), (acc, x) => acc + x.getField("tf"))
            .as("dl"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toMap
      val spec = docs.select(col("doc_id"),
        F.size(F.filter(T.tokens(col("text")), tk => F.length(tk) > 0))
          .cast("long").as("dl"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) null else Long.box(r.getLong(1)))).toMap
      native shouldBe spec
    }
  }
}
