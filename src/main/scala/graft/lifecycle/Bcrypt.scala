package graft.lifecycle

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.SecureRandom

/** Pure-Scala bcrypt (Provos–Mazières OpenBSD password scheme), emitting
  * and verifying the jBCrypt-compatible `$2a$` modular-crypt format the
  * reference stores (`models/User.scala:63-77`, `User.hashPassword` →
  * `BCrypt.hashpw`). Closes DIVERGENCES #5: the offline build has no
  * jBCrypt jar, so the algorithm is implemented here from its public
  * specification — no third-party code, no dependency.
  *
  * Implementation notes:
  *  - Blowfish's P-array and S-boxes are DEFINED as the leading 18 + 1024
  *    32-bit words of π's hexadecimal fraction. Rather than embedding
  *    4 KB of constants, they are computed once at class init from a
  *    Machin-formula π (integer arithmetic, ~8.4k hex digits) and
  *    sanity-checked against the published first words (0x243F6A88…).
  *  - `$2a$` semantics: UTF-8 password bytes + a trailing 0x00, cycled
  *    through the expensive key schedule 2^cost times alternating with
  *    the 128-bit salt; "OrpheanBeholderScryDoubt" enciphered 64 times;
  *    23 of 24 digest bytes emitted in bcrypt's `./A-Za-z0-9` radix-64.
  */
object Bcrypt {

  private val Rounds = 16
  private val PLen = Rounds + 2
  private val SLen = 4 * 256

  /** "OrpheanBeholderScryDoubt" as six big-endian words. */
  private val Ciphertext: Array[Int] =
    Array(0x4f727068, 0x65616e42, 0x65686f6c, 0x64657253, 0x63727944, 0x6f756274)

  /** The first 18 + 1024 words of π's hex fraction (Blowfish's published
    * P/S initializer), via Machin: π = 16·arctan(1/5) − 4·arctan(1/239)
    * in scaled-integer arithmetic. */
  private val PiWords: Array[Int] = {
    val hexDigits = (PLen + SLen) * 8
    val guard = 16
    val unity = BigInteger.valueOf(16).pow(hexDigits + guard)
    def arctanInv(x: Long): BigInteger = {
      val xsq = BigInteger.valueOf(x * x)
      var sum = BigInteger.ZERO
      var term = unity.divide(BigInteger.valueOf(x))
      var k = 0
      while (term.signum != 0) {
        val t = term.divide(BigInteger.valueOf(2L * k + 1))
        sum = if (k % 2 == 0) sum.add(t) else sum.subtract(t)
        term = term.divide(xsq)
        k += 1
      }
      sum
    }
    val pi = BigInteger.valueOf(16).multiply(arctanInv(5))
      .subtract(BigInteger.valueOf(4).multiply(arctanInv(239)))
    val frac = pi.mod(unity) // digits after the hexadecimal point
    val hex = frac.toString(16).reverse.padTo(hexDigits + guard, '0').reverse
    val words = Array.tabulate(PLen + SLen) { i =>
      java.lang.Long.parseLong(hex.substring(i * 8, i * 8 + 8), 16).toInt
    }
    require(words(0) == 0x243f6a88 && words(1) == 0x85a308d3 &&
      words(17) == 0x8979fb1b, // published P[0], P[1], P[17]
      "pi-derived Blowfish tables failed the published-constant check")
    words
  }

  // ---- Blowfish core ------------------------------------------------------

  private final class State {
    val P: Array[Int] = java.util.Arrays.copyOfRange(PiWords, 0, PLen)
    val S: Array[Int] = java.util.Arrays.copyOfRange(PiWords, PLen, PLen + SLen)

    def encipher(lr: Array[Int], off: Int): Unit = {
      var l = lr(off) ^ P(0)
      var r = lr(off + 1)
      var i = 1
      while (i <= Rounds) {
        // F(l): quarter-byte S-box mix — add, xor, add
        var n = S(l >>> 24)
        n += S(0x100 | ((l >>> 16) & 0xff))
        n ^= S(0x200 | ((l >>> 8) & 0xff))
        n += S(0x300 | (l & 0xff))
        r ^= n ^ P(i)
        val t = l; l = r; r = t // swap halves each round
        i += 1
      }
      // undo the final swap; whiten with the last two subkeys
      lr(off) = r ^ P(Rounds + 1)
      lr(off + 1) = l
    }

    /** Next big-endian word from `data`, cycling (the bcrypt key/salt
      * stream). `off(0)` carries the cursor across calls. */
    private def nextWord(data: Array[Byte], off: Array[Int]): Int = {
      var w = 0
      var i = 0
      while (i < 4) {
        w = (w << 8) | (data(off(0)) & 0xff)
        off(0) = (off(0) + 1) % data.length
        i += 1
      }
      w
    }

    /** Standard Blowfish key step: xor key stream into P, then refill
      * P and S by repeated self-encryption of a running block. */
    def key(k: Array[Byte]): Unit = {
      val off = Array(0)
      var i = 0
      while (i < PLen) { P(i) ^= nextWord(k, off); i += 1 }
      val lr = Array(0, 0)
      i = 0
      while (i < PLen) {
        encipher(lr, 0); P(i) = lr(0); P(i + 1) = lr(1); i += 2
      }
      i = 0
      while (i < SLen) {
        encipher(lr, 0); S(i) = lr(0); S(i + 1) = lr(1); i += 2
      }
    }

    /** The "expensive key schedule" variant: like [[key]] but the running
      * block is additionally xored with the cycling salt stream before
      * every encryption. */
    def eksKey(salt: Array[Byte], k: Array[Byte]): Unit = {
      val koff = Array(0)
      val soff = Array(0)
      var i = 0
      while (i < PLen) { P(i) ^= nextWord(k, koff); i += 1 }
      val lr = Array(0, 0)
      i = 0
      while (i < PLen) {
        lr(0) ^= nextWord(salt, soff)
        lr(1) ^= nextWord(salt, soff)
        encipher(lr, 0); P(i) = lr(0); P(i + 1) = lr(1); i += 2
      }
      i = 0
      while (i < SLen) {
        lr(0) ^= nextWord(salt, soff)
        lr(1) ^= nextWord(salt, soff)
        encipher(lr, 0); S(i) = lr(0); S(i + 1) = lr(1); i += 2
      }
    }
  }

  /** EksBlowfish(cost, salt, key) + 64 ECB encryptions of the magic
    * string; returns the 24-byte digest (23 are emitted). */
  private def cryptRaw(password: Array[Byte], salt: Array[Byte], cost: Int): Array[Byte] = {
    require(cost >= 4 && cost <= 30, s"bad bcrypt cost: $cost")
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    val st = new State
    st.eksKey(salt, password)
    var i = 0L
    val rounds = 1L << cost
    while (i < rounds) { st.key(password); st.key(salt); i += 1 }
    val cdata = Ciphertext.clone()
    i = 0
    while (i < 64) {
      var j = 0
      while (j < 3) { st.encipher(cdata, j << 1); j += 1 }
      i += 1
    }
    val out = new Array[Byte](24)
    var w = 0
    while (w < 6) {
      out(w * 4) = (cdata(w) >>> 24).toByte
      out(w * 4 + 1) = (cdata(w) >>> 16).toByte
      out(w * 4 + 2) = (cdata(w) >>> 8).toByte
      out(w * 4 + 3) = cdata(w).toByte
      w += 1
    }
    out
  }

  // ---- bcrypt's radix-64 (OpenBSD alphabet, no padding) -------------------

  private val B64 =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val B64Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    B64.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }

  private def encodeB64(d: Array[Byte], len: Int): String = {
    val sb = new StringBuilder
    var off = 0
    while (off < len) {
      var c1 = d(off) & 0xff
      off += 1
      sb.append(B64(c1 >> 2))
      c1 = (c1 & 0x03) << 4
      if (off >= len) { sb.append(B64(c1)); return sb.toString }
      var c2 = d(off) & 0xff
      off += 1
      sb.append(B64(c1 | (c2 >> 4)))
      c2 = (c2 & 0x0f) << 2
      if (off >= len) { sb.append(B64(c2)); return sb.toString }
      val c3 = d(off) & 0xff
      off += 1
      sb.append(B64(c2 | (c3 >> 6)))
      sb.append(B64(c3 & 0x3f))
    }
    sb.toString
  }

  private def decodeB64(s: String, maxLen: Int): Array[Byte] = {
    val out = Array.newBuilder[Byte]
    var off = 0
    var n = 0
    def v(i: Int): Int = {
      val c = s.charAt(i).toInt
      val x = if (c < 128) B64Inv(c) else -1
      require(x >= 0, s"invalid bcrypt base64 character '${s.charAt(i)}'")
      x
    }
    while (off < s.length - 1 && n < maxLen) {
      val c1 = v(off); val c2 = v(off + 1)
      out += (((c1 << 2) | (c2 >> 4)) & 0xff).toByte
      n += 1
      if (n >= maxLen || off + 2 >= s.length) return out.result()
      val c3 = v(off + 2)
      out += ((((c2 & 0x0f) << 4) | (c3 >> 2)) & 0xff).toByte
      n += 1
      if (n >= maxLen || off + 3 >= s.length) return out.result()
      val c4 = v(off + 3)
      out += ((((c3 & 0x03) << 6) | c4) & 0xff).toByte
      n += 1
      off += 4
    }
    out.result()
  }

  // ---- public surface -----------------------------------------------------

  private val rng = new SecureRandom()

  /** A fresh `$2a$NN$…` salt string. Cost must be in bcrypt's 4..30 range
    * (also keeps the two-digit `%02d` format [[hashpw]] parses honest). */
  def gensalt(cost: Int = 10): String = {
    require(cost >= 4 && cost <= 30, s"bcrypt cost must be in 4..30, got $cost")
    val s = new Array[Byte](16)
    rng.nextBytes(s)
    f"$$2a$$$cost%02d$$${encodeB64(s, 16)}"
  }

  /** Hash `password` under a `$2a$NN$<22-char salt>` salt (or a full
    * previous hash — extra characters past the salt are ignored, which
    * is what makes [[checkpw]] a re-hash-and-compare). */
  def hashpw(password: String, salt: String): String = {
    require(salt.length >= 29 && salt.startsWith("$2a$") && salt.charAt(6) == '$',
      s"invalid bcrypt salt format")
    val cost = salt.substring(4, 6).toInt
    val saltBytes = decodeB64(salt.substring(7, 29), 16)
    // $2a$: UTF-8 password bytes plus a trailing zero byte
    val pw = password.getBytes(StandardCharsets.UTF_8)
    val key = java.util.Arrays.copyOf(pw, pw.length + 1)
    val digest = cryptRaw(key, saltBytes, cost)
    f"$$2a$$$cost%02d$$${encodeB64(saltBytes, 16)}${encodeB64(digest, 23)}"
  }

  /** Constant-time verify of `password` against a stored `$2a$` hash. */
  def checkpw(password: String, stored: String): Boolean =
    try java.security.MessageDigest.isEqual(
      hashpw(password, stored).getBytes(StandardCharsets.UTF_8),
      stored.getBytes(StandardCharsets.UTF_8))
    catch { case _: IllegalArgumentException | _: NumberFormatException => false }
}
