package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern matching (Aho & Corasick 1975): ONE pass
  * over each document counts every occurrence of every dictionary
  * pattern simultaneously, O(|text| + matches) per row regardless of
  * dictionary size.
  *
  * This is the scale tier of the blocklist gate: the `contains`-chain
  * formulation ([[graft.operators.Quality.blocklistGate]]) re-scans the
  * document once PER PHRASE — fine for a dozen phrases, a 10,000-entry
  * production blocklist turns every document into 10,000 scans. The
  * automaton is built once per (executor × dictionary) and cached by the
  * dictionary's identity; per-row work is a single character walk with
  * suffix-link fallbacks. Occurrence semantics: ALL match positions
  * count, including overlapping occurrences and patterns that are
  * substrings of other patterns (each pattern counts independently at
  * every end position — the textbook automaton's output function), which
  * is what makes the count SQL-replayable as a per-position substring
  * equality scan. Matching is case-sensitive over the raw character
  * sequence; normalize/lower upstream if the dictionary expects it.
  */
object AhoCorasick {

  final class Automaton(val patterns: IndexedSeq[String]) extends Serializable {
    require(patterns.nonEmpty, "empty pattern dictionary")
    require(patterns.forall(_.nonEmpty), "empty pattern in dictionary")

    // trie with BFS-computed failure links; out(n) = pattern ids ending
    // at node n INCLUDING via suffix links (flattened at build so the
    // per-character inner loop never chases the fail chain for output)
    private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
    private val fail = mutable.ArrayBuffer(0)
    private val out = mutable.ArrayBuffer[List[Int]](Nil)

    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += mutable.HashMap.empty[Char, Int]
          fail += 0
          out += Nil
          children.size - 1
        })
      }
      out(s) = idx :: out(s)
    }
    locally {
      val queue = mutable.Queue.empty[Int]
      children(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        out(u) = out(u) ::: out(fail(u)) // flatten dictionary-suffix output
        children(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(v) = children(f).getOrElse(ch, 0) match {
            case `v` => 0 // root edge pointing back at v itself
            case w => w
          }
          queue += v
        }
      }
    }

    /** Per-pattern occurrence counts over `text`, one automaton walk. */
    def countAll(text: String): Array[Long] = {
      val counts = new Array[Long](patterns.length)
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !children(s).contains(c)) s = fail(s)
        s = children(s).getOrElse(c, 0)
        var o = out(s)
        while (o.nonEmpty) { counts(o.head) += 1; o = o.tail }
        i += 1
      }
      counts
    }
  }

  // one automaton per (executor × dictionary): expressions re-serialize
  // per task, the build should not
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Automaton]()

  def automaton(patterns: Seq[String]): Automaton =
    cache.computeIfAbsent(patterns, p => new Automaton(p.toIndexedSeq))
}

/** `graft_multi_match(text)` for a literal pattern dictionary: array of
  * per-pattern occurrence counts, ordered by dictionary index.
  * CodegenFallback like [[DeflateRatio]] — the per-row cost is the
  * automaton walk itself, not expression dispatch. */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_multi_match"

  @transient private lazy val ac = AhoCorasick.automaton(patterns)

  override def nullSafeEval(s: Any): Any =
    new GenericArrayData(ac.countAll(s.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternFunctions {
  /** DataFrame-API surface: per-pattern occurrence counts. */
  def multiMatchCounts(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiPatternCount(ExpressionUtils.expression(text), patterns))
}
