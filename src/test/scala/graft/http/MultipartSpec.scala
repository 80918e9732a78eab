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
}
