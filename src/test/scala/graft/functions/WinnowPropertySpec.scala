package graft.functions

import org.apache.spark.sql.functions.{col, explode, length => slen}
import org.apache.spark.sql.graft.TextExpressionFunctions
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test: the native `graft_winnow` expression equals the
  * declarative `gramHashes`/`winnowFromHashes` reference on RANDOM
  * inputs — strings drawn from ASCII, Latin-1 accents, CJK, and mixed
  * alphabets, crossed with random (k, w) — plus the winnowing guarantee
  * itself (any doc is covered: consecutive selected positions are never
  * more than w apart, the property that makes the sketch detect every
  * match of length >= k + w - 1). */
class WinnowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val alphabets = Seq(
    Gen.alphaLowerChar,
    Gen.oneOf('a', 'b'), // heavy ties
    Gen.oneOf('é', 'ü', 'ß', 'ñ', 'a', ' '),
    Gen.oneOf('中', '文', '字', '符', 'a', ' '),
    Gen.asciiPrintableChar)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  "graft_winnow" should "equal the declarative reference on 120 random (text, k, w) cases" in {
    val cases = (0 until 120).map { i =>
      val alpha = alphabets(i % alphabets.size)
      val n = sample(Gen.choose(0, 300), 7L * i + 1)
      val text = (0 until n).map(j => sample(alpha, 31L * i + j)).mkString
      val k = sample(Gen.choose(1, 8), 13L * i + 5)
      val w = sample(Gen.choose(1, 8), 17L * i + 9)
      (i.toLong, text, k, w)
    }
    // group cases by (k, w) so each distinct parameterization runs as one
    // DataFrame comparison (the expression takes k/w as constructor args)
    cases.groupBy { case (_, _, k, w) => (k, w) }.foreach {
      case ((k, w), grp) =>
        val docs = grp.map { case (id, text, _, _) => (id, text) }
          .toDF("doc_id", "text")
          .filter(slen(col("text")) >= k)
        val native = docs
          .select(col("doc_id"),
            explode(TextExpressionFunctions.winnowColumn(col("text"), k, w)).as("s"))
          .select(col("doc_id"), col("s.pos"), col("s.fp"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val reference = docs
          .select(col("doc_id"), TextFunctions.gramHashes(col("text"), k).as("__hs"))
          .select(col("doc_id"),
            explode(TextFunctions.winnowFromHashes(col("__hs"), w)).as("s"))
          .select(col("doc_id"), col("s.pos"), col("s.fp"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        withClue(s"k=$k w=$w: ") { native shouldBe reference }
    }
  }

  it should "never leave a gap wider than w between selections (coverage guarantee)" in {
    val text = (0 until 500).map(j => sample(Gen.alphaLowerChar, 997L * j)).mkString
    val (k, w) = (5, 4)
    val sels = Seq((1L, text)).toDF("doc_id", "text")
      .select(explode(TextExpressionFunctions.winnowColumn(col("text"), k, w)).as("s"))
      .select(col("s.pos")).collect().map(_.getLong(0)).sorted
    sels.head should be < w.toLong // a selection in the first window
    sels.sliding(2).foreach {
      case Array(a, b) => (b - a) should be <= w.toLong
      case _ => ()
    }
    // and the tail is covered too
    val m = text.length - k + 1
    (m - 1 - sels.last) should be < w.toLong
  }
}
