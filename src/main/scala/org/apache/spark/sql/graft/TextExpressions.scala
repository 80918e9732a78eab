package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * first step of corpus text canonicalization (composed accents collapse
  * to single codepoints so visually-identical strings hash/dedup
  * identically). Spark has no built-in normalizer; a Scala UDF would
  * break whole-stage codegen around it, while this stays inline (the
  * generated code is a single static call, value-independent).
  *
  * The common case is pure-ASCII text, which is NFC by construction:
  * [[NfcHelper.nfc]] short-circuits on `Normalizer.isNormalized` (a scan,
  * no allocation) so the hot path never copies. Semantics match any
  * correct Unicode NFC implementation (e.g. DuckDB's `nfc_normalize`),
  * which is what lets the oracle replay it. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = child.dataType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcHelper.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.NfcHelper.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcHelper {
  /** NFC-normalize, returning the input object untouched when already
    * normalized. Two tiers: pure-ASCII (the common corpus case) is NFC by
    * construction and detected on the RAW UTF-8 bytes (`isFullAscii`, a
    * scan with zero decode/allocation); only non-ASCII rows pay the
    * String decode for `Normalizer.isNormalized`, and only actually
    * non-normalized rows allocate a new string. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

/** Winnowing fingerprint selection (Schleimer–Wilkerson–Aiken) as ONE
  * native expression: k-char-gram md5 hashes + sliding rightmost-min
  * window + dedupe, all in a single compiled pass over the row.
  *
  * Why native: the declarative formulation
  * ([[graft.functions.TextFunctions.winnowFromHashes]], kept as the
  * executable reference spec) nests lambdas inside `transform`, and
  * Spark's higher-order functions are interpreted with NO common
  * subexpression reuse — every window re-walks its slice, ~10 boxed
  * element touches per window, which measured 17 s for the sf0.1 corpus.
  * This expression computes the same selection in O(m·w) primitive ops
  * (m = chars−k+1): one UTF-8 offset walk, one md5 per gram (identical
  * bytes to `md5(substring(text, i, k))`, so the fp values — first 4
  * digest bytes as an unsigned int — replay verbatim in the DuckDB
  * oracle), one boolean mark per window, selections emitted in ascending
  * position order exactly like `array_sort(array_distinct(...))` on the
  * reference formulation ([[graft.functions.TextFunctionsSpec]] pins the
  * parity on real and adversarial strings). Single `eval` call per row
  * (CodegenFallback placement); the loop IS the work. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pos",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("fp",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(s: Any): Any =
    WinnowHelper.winnow(s.asInstanceOf[UTF8String], k, w)

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowHelper {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def winnow(s: UTF8String, k: Int, w: Int):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    val m = nChars - k + 1
    if (m <= 0) {
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    }
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
    // gram hashes: first 4 md5 digest bytes as an unsigned 32-bit value —
    // byte-identical to conv(substr(md5(gram), 1, 8), 16, 10)
    val digest = md.get()
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      digest.reset()
      digest.update(bytes, starts(g), starts(g + k) - starts(g))
      val d = digest.digest()
      hs(g) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      g += 1
    }
    // sliding window, rightmost min (<= keeps the latest index)
    val wl = math.min(m, w)
    val nw = m - wl + 1
    val sel = new Array[Boolean](m)
    var nSel = 0
    var j = 0
    while (j < nw) {
      var best = j
      var q = j + 1
      while (q < j + wl) {
        if (hs(q) <= hs(best)) best = q
        q += 1
      }
      if (!sel(best)) { sel(best) = true; nSel += 1 }
      j += 1
    }
    // emit in ascending position order (== array_sort on (pos, fp))
    val out = new Array[Any](nSel)
    var o = 0
    var i = 0
    while (i < m) {
      if (sel(i)) {
        out(o) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i.toLong, hs(i)))
        o += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Deflate compression ratio `compressed_bytes / raw_bytes` — the classic
  * cheap repetition/boilerplate proxy (highly repetitive or templated
  * text compresses far below natural prose; corpus pipelines gate on it
  * next to the token-level repetition signals). Level-6 Deflate with the
  * default strategy, so the ratio is deterministic for a given corpus; no
  * SQL engine replays zlib, so queries over this are rows-only with a
  * spec pinning the discrimination property. Native expression for the
  * usual reason: a UDF would sever whole-stage codegen around the scan.
  * Empty input → ratio 1.0 (nothing to compress, nothing saved). */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_deflate_ratio"

  override def nullSafeEval(s: Any): Any =
    DeflateHelper.ratio(s.asInstanceOf[UTF8String])

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object DeflateHelper {
  private val buf = ThreadLocal.withInitial[Array[Byte]](() => new Array[Byte](8192))
  // one native zlib stream per executor thread, reset() per row — a
  // per-row Deflater would pay native init/end (malloc + free) on every
  // document of the corpus
  private val defl = ThreadLocal.withInitial[java.util.zip.Deflater](
    () => new java.util.zip.Deflater(6, true))

  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val deflater = defl.get()
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    var total = 0L
    val b = buf.get()
    while (!deflater.finished()) total += deflater.deflate(b)
    total.toDouble / bytes.length
  }
}

/** Count-sketch (feature-hashing) document embedding as ONE native
  * expression: walk the token array once, md5-hash each token ONCE, and
  * accumulate its ±1 contribution into a mutable `dim`-slot long buffer —
  * O(|doc| + dim) per row.
  *
  * Why native: the declarative formulation
  * ([[graft.functions.TextFunctions.hashSketchSpec]], kept as the
  * executable reference spec) builds a (bucket, sign) pair array and then
  * folds, PER OUTPUT DIMENSION, a `filter` over that array — and Spark's
  * higher-order functions are interpreted with no cross-lambda reuse, so
  * the shipped plan paid dim·|doc| boxed comparisons (and, before r10,
  * recomputed the md5 pair array itself once per dimension: 64× redundant
  * hashing, the round-9 `weak` flag). The hash math here is bit-identical
  * to the declarative/DuckDB replay: bucket = first 4 md5 digest bytes as
  * an unsigned 32-bit value mod `dim` (== `conv(substr(md5(t),1,8),16,10)
  * % dim`), sign = parity of the 9th hex digit, i.e. of the high nibble
  * of digest byte 4 (== `conv(substr(md5(t),9,1),16,10) % 2 * 2 - 1`).
  * Null tokens contribute nothing (the HOF's `null === j` filter drops
  * them). Single `eval` per row (CodegenFallback placement); the loop IS
  * the work — the same discipline as [[WinnowFingerprints]]. */
case class CountSketchTokens(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(dim >= 1, s"dim must be positive: $dim")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_count_sketch"

  override def nullSafeEval(a: Any): Any =
    CountSketchHelper.sketch(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], dim)

  override protected def withNewChildInternal(newChild: Expression): CountSketchTokens =
    copy(child = newChild)
}

object CountSketchHelper {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def sketch(arr: org.apache.spark.sql.catalyst.util.ArrayData, dim: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val buf = new Array[Long](dim)
    val digest = md.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        digest.reset()
        digest.update(bytes)
        val d = digest.digest()
        // first 4 digest bytes as unsigned 32-bit == conv(substr(md5,1,8),16,10)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        // 9th hex digit == high nibble of byte 4; parity -> sign
        val sign = (((d(4) >> 4) & 1) << 1) - 1L
        buf((h % dim).toInt) += sign
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(buf)
  }
}

/** Shannon entropy of the within-document token distribution as ONE
  * native expression: sort the row's token array (UTF8 binary order —
  * exactly `array_sort`'s ordering), walk the sorted runs once, and fold
  * `acc − p·ln p` per distinct token in ascending token order —
  * O(|toks| log |toks|) per row.
  *
  * Why native: the declarative formulation
  * ([[graft.functions.TextFunctions.tokenEntropySpec]], kept as the
  * executable reference spec) re-counts each distinct token with a
  * `filter` scan over the whole token array — O(|distinct|·|toks|) boxed
  * comparisons per row in interpreted HOF lambdas (the same
  * loop-invariant-recompute trap as the count-sketch kernel, flagged by
  * the r9 audit). The fold here is BIT-IDENTICAL to that formulation:
  * identical run order (binary-sorted distinct tokens), identical term
  * (`p·StrictMath.log(p)` — Spark's `log` binds StrictMath), identical
  * subtract-fold seed (+0.0 for one-token docs, not −0.0). A null token
  * poisons the result to NaN exactly like the HOF's 0·ln 0 term (callers
  * filter empties first; the oracle never sees nulls). Raw H out —
  * callers apply the empty-doc guard and `round(·, 6)` so Spark's own
  * round semantics stay in the plan. */
case class TokenEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_token_entropy"

  override def nullSafeEval(a: Any): Any =
    TokenEntropyHelper.entropy(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def withNewChildInternal(newChild: Expression): TokenEntropy =
    copy(child = newChild)
}

object TokenEntropyHelper {
  def entropy(arr: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // HOF parity: a null token's filter-count is 0, and 0·ln 0 = NaN
      if (arr.isNullAt(i)) return Double.NaN
      toks(i) = arr.getUTF8String(i)
      i += 1
    }
    // UTF8String.compareTo is unsigned-byte order == array_sort on strings
    java.util.Arrays.sort(toks,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val nd = n.toDouble
    var acc = 0.0
    var start = 0
    while (start < n) {
      var end = start + 1
      while (end < n && toks(end).equals(toks(start))) end += 1
      val p = (end - start).toDouble / nd
      acc -= p * java.lang.StrictMath.log(p)
      start = end
    }
    acc
  }
}

/** Per-document (term, tf) entries of a token array as ONE native kernel
  * — the row-local replacement for `explode(tokens) → groupBy(term, id) →
  * count(...)`. Term frequency is a PER-DOCUMENT aggregate, so computing
  * it inside the row turns an inverted-index build
  * ([[graft.store.SparseIndex.save]]) from a corpus-scale token explode +
  * exchange + hash re-aggregate into a zero-shuffle projection: the
  * explode that remains emits one row per DISTINCT (doc, term) — the
  * postings themselves — never one per token occurrence, and no exchange
  * follows it (optimization r17, guide §1.2 step 1 + §2.4; the map-side
  * partials of the old groupBy already collapsed each doc's duplicates,
  * so its exchange + final aggregate moved postings-scale rows purely to
  * re-merge partials that never overlap across docs).
  *
  * Value parity with the declarative form, pinned by TokenTfSpec:
  *  - empty tokens are skipped — exactly `filter(length(term) > 0)`;
  *  - a null token is skipped — `length(null) > 0` filters it out;
  *  - tf is the exact occurrence count (long, like `count(lit(1))`);
  *  - a NULL array yields NULL (explode of null emits no rows, and the
  *    doc-length fold over the entries stays null like
  *    `size(filter(null, ...))`);
  *  - entries are emitted in unsigned-byte term order (UTF8String
  *    compareTo == `array_sort` on strings) — deterministic output, and
  *    Σtf over the sorted entries equals the nonzero-token count, which
  *    is what lets doc length ride the same single tokenize pass.
  *
  * Sort-then-run-count (the [[TokenEntropyHelper]] shape): O(n log n),
  * zero hash state, one allocation per distinct term. */
case class TokenTfEntries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("tf",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_token_tf"

  override def nullSafeEval(a: Any): Any =
    TokenTfHelper.entries(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def withNewChildInternal(newChild: Expression): TokenTfEntries =
    copy(child = newChild)
}

object TokenTfHelper {
  def entries(
      arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = arr.numElements()
    // drop null/empty tokens — the `filter(length(term) > 0)` parity
    var kept = 0
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        if (t.numBytes() > 0) { toks(kept) = t; kept += 1 }
      }
      i += 1
    }
    if (kept == 0) return new GenericArrayData(Array.empty[Any])
    java.util.Arrays.sort(toks, 0, kept,
      (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val out = new java.util.ArrayList[Any]
    var start = 0
    while (start < kept) {
      var end = start + 1
      while (end < kept && toks(end).equals(toks(start))) end += 1
      out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](toks(start), (end - start).toLong)))
      start = end
    }
    new GenericArrayData(out.toArray)
  }
}

/** Jaro–Winkler similarity (Jaro 1989; Winkler 1990) as a native
  * expression — the classic record-linkage comparator for short identity
  * strings (names, codes): insertion/deletion/transposition tolerant,
  * with the Winkler common-prefix boost that rewards the
  * agreement-starts-at-the-front pattern of real-world name typos.
  *
  * Semantics are pinned to the textbook definition so the DuckDB oracle
  * can replay it with its built-in `jaro_winkler_similarity`:
  * matching window `max(|a|,|b|)/2 − 1`, first-available greedy match,
  * half-transposition count, Jaro `(m/|a| + m/|b| + (m−t)/m) / 3`,
  * prefix boost `j + ℓ·0.1·(1−j)` with ℓ = common prefix capped at 4,
  * applied only when `j > 0.7` (the standard boost threshold), and
  * either-empty → 0.0 (including both-empty — NOT 1.0). Verified
  * bit-identical to DuckDB on a 20k random-pair fuzz plus the published
  * MARTHA/DIXON vectors ([[graft.functions.TextFunctionsSpec]]).
  * Operates on UTF-16 code units; identical to code-point semantics for
  * ASCII/BMP text, which is what identity strings are.
  *
  * Single `eval` per row pair (CodegenFallback placement); the
  * windowed match loop IS the work — the [[WinnowFingerprints]]
  * discipline. */
case class JaroWinkler(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerHelper.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerHelper {
  /** Textbook Jaro–Winkler; op order pinned (each division int→double,
    * summed left-to-right, one divide by 3.0; boost `ℓ·0.1` first, then
    * `·(1−j)`) so the IEEE result replays bit-identically in engines
    * implementing the same definition. */
  def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j0 = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j0 > 0.7) {
      var l = 0
      val maxP = math.min(4, math.min(l1, l2))
      while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
      j0 + l * 0.1 * (1.0 - j0)
    } else j0
  }
}

object TextExpressionFunctions {
  val nfcDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
    (children: Seq[Expression]) => NfcNormalize(children.head))

  /** DataFrame-API surface. */
  def nfcColumn(s: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(s)))

  /** DataFrame-API surface for the native winnowing selection. */
  def winnowColumn(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(
      WinnowFingerprints(ExpressionUtils.expression(text), k, w))

  /** DataFrame-API surface for the deflate compression-ratio signal. */
  def deflateRatioColumn(text: Column): Column =
    ExpressionUtils.column(DeflateRatio(ExpressionUtils.expression(text)))

  /** DataFrame-API surface for the one-pass count-sketch embedding. */
  def countSketchColumn(toks: Column, dim: Int): Column =
    ExpressionUtils.column(
      CountSketchTokens(ExpressionUtils.expression(toks), dim))

  /** DataFrame-API surface for the one-pass token-entropy kernel. */
  def tokenEntropyColumn(toks: Column): Column =
    ExpressionUtils.column(TokenEntropy(ExpressionUtils.expression(toks)))

  /** DataFrame-API surface for the row-local (term, tf) entries kernel. */
  def tokenTfColumn(toks: Column): Column =
    ExpressionUtils.column(TokenTfEntries(ExpressionUtils.expression(toks)))

  /** DataFrame-API surface for the Jaro–Winkler comparator. */
  def jaroWinklerColumn(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroWinkler(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
