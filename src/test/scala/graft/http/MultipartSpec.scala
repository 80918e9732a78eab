package graft.http

import java.nio.charset.StandardCharsets

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** RFC 2046/7578 framing edges of the multipart reader — the wire-level
  * happy path is covered by SentinelHttpSpec; this pins the byte-exact
  * delimiter scanning rules. */
class MultipartSpec extends AnyFlatSpec with Matchers {

  private def bytes(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

  private def body(boundary: String, parts: (String, Array[Byte])*): Array[Byte] = {
    val sb = new java.io.ByteArrayOutputStream()
    parts.foreach { case (name, data) =>
      sb.write(bytes(s"--$boundary\r\n"))
      sb.write(bytes(s"""Content-Disposition: form-data; name="$name"\r\n\r\n"""))
      sb.write(data)
      sb.write(bytes("\r\n"))
    }
    sb.write(bytes(s"--$boundary--\r\n"))
    sb.toByteArray
  }

  behavior of "Multipart.parse"

  it should "round-trip simple parts byte-exactly" in {
    val parsed = Multipart.parse(
      body("XYZ", "a" -> bytes("hello"), "b" -> Array[Byte](0, 1, 2, '\r', '\n', 3)),
      "XYZ")
    parsed.map(_.name) shouldBe Seq("a", "b")
    parsed(0).bytes shouldBe bytes("hello")
    parsed(1).bytes shouldBe Array[Byte](0, 1, 2, '\r', '\n', 3)
  }

  it should "not split a binary part whose body contains the boundary bytes mid-line" in {
    // "--XYZ" appears inside the part body but NOT preceded by CRLF — per
    // RFC 2046 the delimiter is CRLF + "--boundary", so this is content
    val payload = bytes("prefix --XYZ suffix")
    val parsed = Multipart.parse(body("XYZ", "f" -> payload), "XYZ")
    parsed.map(_.name) shouldBe Seq("f")
    parsed.head.bytes shouldBe payload
  }

  it should "drop an unterminated part instead of mis-splitting it" in {
    // the closing delimiter is preceded by a bare LF (malformed client):
    // under RFC 2046 scanning that is NOT a delimiter, so the part is
    // unterminated — parse yields nothing and the caller 400s on the
    // missing required part, rather than returning silently-truncated bytes
    val raw = bytes("--B\r\n" +
      "Content-Disposition: form-data; name=\"x\"\r\n\r\n" +
      "tail") ++ bytes("\n--B--\r\n")
    Multipart.parse(raw, "B") shouldBe empty
  }

  it should "handle a part body that ends exactly at the closing delimiter with CRLF" in {
    val parsed = Multipart.parse(body("Q", "only" -> Array.emptyByteArray), "Q")
    parsed.map(_.name) shouldBe Seq("only")
    parsed.head.bytes shouldBe Array.emptyByteArray
  }

  it should "round-trip random binary parts, including bodies containing boundary-like bytes" in {
    val rnd = new scala.util.Random(99)
    val boundary = "graftB7"
    val boundaryBytes = bytes(s"--$boundary")
    for (_ <- 1 to 200) {
      val nParts = 1 + rnd.nextInt(4)
      val parts = (1 to nParts).map { i =>
        val len = rnd.nextInt(400)
        val data = new Array[Byte](len)
        rnd.nextBytes(data)
        // plant adversarial fragments: the raw boundary mid-body (NOT
        // CRLF-preceded — replace any accidental preceding CRLF), bare
        // CR/LF runs, and a trailing CR
        if (len > boundaryBytes.length + 4 && rnd.nextBoolean()) {
          val at = 1 + rnd.nextInt(len - boundaryBytes.length - 2)
          System.arraycopy(boundaryBytes, 0, data, at, boundaryBytes.length)
          if (data(at - 1) == '\n') data(at - 1) = 'x'
          if (at >= 2 && data(at - 2) == '\r') data(at - 2) = 'x'
        }
        // a body must not itself contain the CRLF+delimiter sequence
        // (that IS a delimiter per the RFC); scrub any accidental one
        val crlfDelim = bytes("\r\n--" + boundary)
        def scrub(): Unit = {
          var p = 0
          while (p + crlfDelim.length <= data.length) {
            if (data.slice(p, p + crlfDelim.length).sameElements(crlfDelim)) data(p) = 'x'
            p += 1
          }
        }
        scrub()
        s"p$i" -> data
      }
      val parsed = Multipart.parse(body(boundary, parts: _*), boundary)
      parsed.map(_.name) shouldBe parts.map(_._1)
      parsed.zip(parts).foreach { case (got, (_, want)) =>
        got.bytes shouldBe want
      }
    }
  }
}
