package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

/** Pins the r17 native MinHash/Jaccard kernels to their declarative
  * reference formulations — the bit-identical contract that lets the
  * optimization round swap physical shapes without touching any oracle. */
class MinhashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def crafted = Seq[(Long, String)](
    (1L, "héllo   wörld\tHÉLLO\nwörld  mixed space"),
    (2L, "aaaaaaaaaaaaaaaaaaaaaaa"),
    (3L, "中文字符串的指纹选择测试中文字符串"),
    (4L, "abcde"),
    (5L, "ab"),
    (6L, ""),
    (7L, "   \t\n  "),
    (8L, null),
    (9L, "The quick brown fox jumps over the lazy dog; THE QUICK brown FOX.")
  ).toDF("doc_id", "text")

  "MinhashSignature (native)" should "match the declarative spec exactly on both tiers" in {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
    for {
      docs <- Seq(crafted, real)
      tier <- Seq(Dedup.PortableMd5, Dedup.FastXx)
      (n, k) <- Seq((5, 8), (5, 16), (3, 6))
    } {
      val native = Dedup.minhashSignatures(docs, "text", "doc_id", n, k, tier)
        .collect().map(r => (r.getLong(0), r.getSeq[Any](1).toList)).toMap
      val spec = Dedup.minhashSignaturesSpec(docs, "text", "doc_id", n, k, tier)
        .collect().map(r => (r.getLong(0), r.getSeq[Any](1).toList)).toMap
      native.keySet shouldBe spec.keySet
      for (id <- spec.keySet) {
        withClue(s"tier=$tier n=$n k=$k doc=$id: ") {
          native(id) shouldBe spec(id)
        }
      }
    }
  }

  it should "declare the same schema as the spec (array<bigint> with nullable slots)" in {
    val d = crafted
    Dedup.minhashSignatures(d, "text", "doc_id").schema shouldBe
      Dedup.minhashSignaturesSpec(d, "text", "doc_id").schema
  }

  "JaccardSimilarity (native)" should "match size(array_intersect)/union arithmetic bit-for-bit" in {
    // crafted arrays: duplicates, null elements, empties, disjoint,
    // identical, one-side-null
    val rows = Seq[(Seq[String], Seq[String])](
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "x", "x")),
      (Seq(), Seq("a")),
      (Seq(), Seq()),
      (Seq("a", null, "b"), Seq(null, "c")),
      (Seq("x"), Seq("y")),
      (Seq("s", "t"), Seq("s", "t")),
      (null, Seq("a")),
      (Seq("a"), null)
    ).toDF("a", "b")
    val out = rows.select(
      org.apache.spark.sql.graft.MinhashExpressionFunctions
        .jaccardColumn(col("a"), col("b")).as("native"),
      T.jaccard(col("a"), col("b")).as("ref")).collect()
    out.foreach { r =>
      withClue(s"row $r: ") {
        if (r.isNullAt(1)) r.isNullAt(0) shouldBe true
        else java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
          java.lang.Double.doubleToRawLongBits(r.getDouble(1))
      }
    }
  }

  "SortedIntersectCount (native)" should "reproduce the hash-kernel jaccard bit-for-bit from sorted-distinct sets + raw sizes" in {
    // the lshRecall/lshCalibration formulation: per-doc
    // array_sort(array_distinct(s)) + raw size, per-pair merge-walk count,
    // ratio = ic / max((na+nb) - ic, 1) over doubles — must equal the
    // JaccardSimilarity kernel on the ORIGINAL arrays exactly
    val crafted = Seq[(Seq[String], Seq[String])](
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "x", "x")),
      (Seq(), Seq("a")),
      (Seq(), Seq()),
      (Seq("a", null, "b"), Seq(null, "c")),
      (Seq("x"), Seq("y")),
      (Seq("s", "t"), Seq("s", "t")),
      (null, Seq("a")),
      (Seq("a"), null)
    ).toDF("a", "b")
    val real = {
      val sets = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(40)
        .select(col("doc_id").as("id"), T.charShingles(col("text"), 5).as("s"))
      sets.select(col("s").as("a"))
        .crossJoin(sets.select(col("s").as("b")))
    }
    for (rows <- Seq(crafted, real)) {
      val ic = org.apache.spark.sql.graft.MinhashExpressionFunctions
        .sortedIntersectColumn(
          array_sort(array_distinct(col("a"))),
          array_sort(array_distinct(col("b")))).cast("double")
      val out = rows.select(
        (ic / greatest(
          (org.apache.spark.sql.functions.size(col("a")) +
            org.apache.spark.sql.functions.size(col("b"))).cast("double") - ic,
          lit(1.0))).as("native"),
        org.apache.spark.sql.graft.MinhashExpressionFunctions
          .jaccardColumn(col("a"), col("b")).as("ref")).collect()
      out should not be empty
      out.foreach { r =>
        withClue(s"row $r: ") {
          if (r.isNullAt(1)) r.isNullAt(0) shouldBe true
          else java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
            java.lang.Double.doubleToRawLongBits(r.getDouble(1))
        }
      }
    }
  }

  it should "match the reference on real shingle-set pairs" in {
    val sets = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(40)
      .select(col("doc_id").as("id"), T.charShingles(col("text"), 5).as("s"))
    val pairs = sets.select(col("id").as("ia"), col("s").as("sa"))
      .crossJoin(sets.select(col("id").as("ib"), col("s").as("sb")))
    val out = pairs.select(
      org.apache.spark.sql.graft.MinhashExpressionFunctions
        .jaccardColumn(col("sa"), col("sb")).as("native"),
      T.jaccard(col("sa"), col("sb")).as("ref")).collect()
    out should not be empty
    out.foreach { r =>
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))
    }
  }
}
