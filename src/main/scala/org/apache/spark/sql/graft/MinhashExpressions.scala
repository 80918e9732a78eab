package org.apache.spark.sql.graft

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document MinHash signature as ONE native expression: lower-case +
  * whitespace normalization, char-shingle walk, `k` seeded hash slots and
  * their running minima — a single compiled pass over the row.
  *
  * Why native (guide §1.2 step 1 + §2.4): the declarative pipeline in
  * [[graft.operators.Dedup.minhashSignatures]] (kept as the executable
  * reference spec) explodes one row per (doc, shingle position) — ~300×
  * the corpus row count — evaluates `md5` into a HEX STRING per digest,
  * re-parses 8-hex-char slices with `conv`, and then pays a hash
  * aggregation SHUFFLE to min-combine the slots per doc. All of that is
  * per-doc-local work: this expression computes the identical slot values
  * from the raw digest bytes (no hex round-trip) and folds the minima in
  * registers, so the explode rows never exist and the signature shuffle
  * disappears from every MinHash consumer (dedup_*, lsh_*, split_leakage,
  * curate benchmarks, streaming admission).
  *
  * Value-identical by construction, pinned by MinhashExpressionsSpec on
  * real + adversarial corpora against the declarative spec:
  *  - normalization calls the SAME kernels Spark's `lower` and
  *    `regexp_replace` call (`UTF8String.toLowerCase`, `java.util.regex`
  *    over the decoded string);
  *  - shingle positions replicate `sequence(1, greatest(len-n+1, 1))` +
  *    `substring(norm, pos, n)` (code-point arithmetic, clamped tail);
  *  - md5 tier: slot `i` = unsigned 32-bit value of digest bytes
  *    `4*(i%4)..4*(i%4)+3` of `md5("⟨i/4⟩:" ++ shingle)` — byte-identical
  *    to `conv(substring(md5(concat('⟨i/4⟩:', sh)), (i%4)*8+1, 8), 16, 10)`,
  *    so the DuckDB oracle replay is untouched;
  *  - xx tier: slot `i` = `xxhash64(i, shingle)` via the same [[XXH64]]
  *    chain Spark's expression folds (seed 42 → hashInt → bytes);
  *  - a NULL text yields an array of `k` NULL slots — exactly what
  *    `min(null-only group)` produced per slot in the aggregate form.
  *
  * Single `eval` call per row does all the work (CodegenFallback
  * placement, the [[WinnowFingerprints]] discipline). */
case class MinhashSignature(child: Expression, shingleN: Int, k: Int, xxTier: Boolean)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(shingleN >= 1 && k >= 1, "need shingleN >= 1 and k >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinhashSigHelper.nullSig(k, xxTier)
    else MinhashSigHelper.sig(v.asInstanceOf[UTF8String], shingleN, k, xxTier)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSigHelper {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))
  private val ws = Pattern.compile("\\s+")

  /** NULL text in the declarative spec yields ONE all-null shingle row,
    * so per slot: md5 tier null-propagates (`min` of a null-only group is
    * null) while xxhash64 SKIPS null children (Spark hash-expression
    * contract) — slot `i` stays at its seed chain `hashInt(i, 42)`. */
  def nullSig(k: Int, xxTier: Boolean): GenericArrayData =
    if (xxTier)
      new GenericArrayData(
        Array.tabulate[Any](k)(i => Long.box(XXH64.hashInt(i, 42L))))
    else new GenericArrayData(Array.fill[Any](k)(null))

  def sig(text: UTF8String, n: Int, k: Int, xxTier: Boolean): GenericArrayData = {
    // normalization — the same kernels lower()/regexp_replace() call
    val lowered = text.toLowerCase
    val norm = UTF8String.fromString(ws.matcher(lowered.toString).replaceAll(" "))
    val bytes = norm.getBytes
    val nChars = norm.numChars()
    // sequence(1, greatest(nChars - (n-1), 1)): at least one (possibly
    // short/empty) shingle, clamped at the tail like substring()
    val count = math.max(nChars - (n - 1), 1)
    // char -> byte-offset table (one UTF-8 walk)
    val starts = new Array[Int](nChars + 1)
    var ci = 0
    var p = 0
    while (p < bytes.length) {
      starts(ci) = p
      p += UTF8String.numBytesForFirstByte(bytes(p))
      ci += 1
    }
    starts(nChars) = bytes.length
    val mins = Array.fill(k)(Long.MaxValue)
    if (xxTier) {
      // xxhash64(i, shingle): seed 42 -> hashInt(i) -> hashUnsafeBytes
      val seeds = new Array[Long](k)
      var i = 0
      while (i < k) { seeds(i) = XXH64.hashInt(i, 42L); i += 1 }
      var pos = 0
      while (pos < count) {
        val s = starts(pos)
        val e = starts(math.min(pos + n, nChars))
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(
            bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s,
            e - s, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
        pos += 1
      }
    } else {
      // md5 tier: digest d over ("d:" ++ shingle); slot i = unsigned int of
      // digest(i/4) bytes 4*(i%4)..4*(i%4)+3
      val digest = md.get()
      val nDigests = (k + 3) / 4
      val prefixes = Array.tabulate(nDigests)(d => s"$d:".getBytes("UTF-8"))
      var pos = 0
      while (pos < count) {
        val s = starts(pos)
        val e = starts(math.min(pos + n, nChars))
        var d = 0
        while (d < nDigests) {
          digest.reset()
          digest.update(prefixes(d))
          digest.update(bytes, s, e - s)
          val out = digest.digest()
          var j = 0
          val slotBase = d * 4
          while (j < 4 && slotBase + j < k) {
            val o = j * 4
            val h = ((out(o) & 0xffL) << 24) | ((out(o + 1) & 0xffL) << 16) |
              ((out(o + 2) & 0xffL) << 8) | (out(o + 3) & 0xffL)
            if (h < mins(slotBase + j)) mins(slotBase + j) = h
            j += 1
          }
          d += 1
        }
        pos += 1
      }
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}

/** Jaccard similarity of two `array<string>` columns as ONE native kernel:
  * `|distinct(a) ∩ b| / greatest(size(a) + size(b) − |∩|, 1)` — the exact
  * arithmetic of `size(array_intersect(a, b)) / greatest(size(a) +
  * size(b) − size(array_intersect(a, b)), 1)` without materializing the
  * intersection ARRAY (Spark's `ArrayIntersect` builds an output array +
  * two hash sets per evaluation just so `size()` can count it).
  *
  * Why native: the LSH truth loops ([[graft.operators.Reports.lshRecall]]'s
  * sample² cross join, [[graft.operators.Reports.lshCalibration]]'s
  * candidate re-check) evaluate this per PAIR — hundreds of thousands of
  * evaluations over ~300-element shingle arrays, the hot loop of both
  * queries. One linear-probe hash set over the smaller side, a membership
  * walk over the other, zero allocations beyond the set.
  *
  * Value-identical: intersection counting is distinct-based exactly like
  * `array_intersect` (duplicates in `a` count once; a null element matches
  * a null element); sizes are RAW array lengths like `size()`; the
  * division replicates `cast(int as double)` arithmetic bit-for-bit.
  * NULL if either array is NULL (same as size/array_intersect). */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardHelper.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

object JaccardHelper {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    // build the set over the SMALLER side, probe with the larger: the
    // probe dedupes via removal so duplicate probes can't double-count
    val (small, nSmall, large, nLarge) =
      if (na <= nb) (a, na, b, nb) else (b, nb, a, na)
    val set = new java.util.HashSet[UTF8String](math.max(nSmall * 2, 4))
    var sawNullSmall = false
    var i = 0
    while (i < nSmall) {
      if (small.isNullAt(i)) sawNullSmall = true
      else set.add(small.getUTF8String(i))
      i += 1
    }
    var inter = 0
    var j = 0
    while (j < nLarge && (!set.isEmpty || sawNullSmall)) {
      if (large.isNullAt(j)) {
        if (sawNullSmall) { inter += 1; sawNullSmall = false }
      } else if (set.remove(large.getUTF8String(j))) {
        inter += 1
      }
      j += 1
    }
    val interD = inter.toDouble
    // (size(a) + size(b)) is int addition, then int->double cast, exactly
    // like the declarative greatest(size(a)+size(b) - inter, 1)
    val denom = math.max((na + nb).toDouble - interD, 1.0)
    interD / denom
  }
}

/** Intersection COUNT of two SORTED-DISTINCT `array<string>` columns as
  * one allocation-free merge walk — the per-pair kernel for truth loops
  * whose per-DOC sets can be canonicalized once
  * (`array_sort(array_distinct(...))` in the doc-side projection) instead
  * of hashed per PAIR: [[JaccardSimilarity]] builds and probes a hash set
  * for every pair evaluation (~n hash+equals of short strings plus the
  * set allocation), while two already-sorted sides intersect in ≤ n_a+n_b
  * unsigned-byte compares with zero allocation (optimization r17, guide
  * §1.2 step 2 — move per-pair work to per-doc).
  *
  * CONTRACT: both inputs strictly ascending in UTF8String (unsigned-byte)
  * order with no duplicates — exactly `array_sort(array_distinct(x))` for
  * arrays without null elements, plus at most one trailing null
  * (array_sort places nulls last; two trailing nulls match like
  * array_intersect's null-matches-null). The count equals
  * `size(array_intersect(a, b))` of the ORIGINAL arrays, because
  * array_intersect is distinct-based. NULL if either array is NULL. */
case class SortedIntersectCount(left: Expression, right: Expression,
    asDeterministic: Boolean = true)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_sorted_intersect_n"
  // `asDeterministic = false` is the guide §4.4 duplication stopper for
  // consumers whose downstream FILTER references a column derived from
  // this kernel: Catalyst pushes such filters through projections by
  // SUBSTITUTION, so a threshold filter above a pair join lands in the
  // join condition with the kernel inlined — evaluated twice there (the
  // ratio references the count in numerator and denominator) plus once
  // in the output projection. The value is pure (the flag only blocks
  // reorder/duplication); flip it only on the expensive hot-loop sites.
  override lazy val deterministic: Boolean = asDeterministic

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectHelper.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectHelper {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      // nulls sort last (array_sort semantics): a null on one side means
      // only nulls remain THERE — the other side may still hold non-null
      // elements before its own trailing null, so advance it to a null
      // (if any) and count the null∩null match exactly once
      if (a.isNullAt(i)) {
        while (j < nb && !b.isNullAt(j)) j += 1
        if (j < nb) n += 1
        return n
      }
      if (b.isNullAt(j)) {
        while (i < na && !a.isNullAt(i)) i += 1
        if (i < na) n += 1
        return n
      }
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}

object MinhashExpressionFunctions {
  /** DataFrame-API surface for the one-pass MinHash signature. */
  def minhashSigColumn(text: Column, shingleN: Int, k: Int, xxTier: Boolean): Column =
    ExpressionUtils.column(
      MinhashSignature(ExpressionUtils.expression(text), shingleN, k, xxTier))

  /** DataFrame-API surface for the native Jaccard kernel. */
  def jaccardColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** DataFrame-API surface for the sorted-distinct intersect count.
    * `asDeterministic = false` stops filter-pushdown duplication (see
    * the expression's scaladoc); values are identical either way. */
  def sortedIntersectColumn(a: Column, b: Column,
      asDeterministic: Boolean = true): Column =
    ExpressionUtils.column(SortedIntersectCount(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      asDeterministic))
}
