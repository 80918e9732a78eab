package graft.http

import java.nio.charset.StandardCharsets

/** Minimal `multipart/form-data` (RFC 7578) reader for the upload route —
  * the reference accepts run summaries as a multipart file part named
  * `run` (`api/RunsController.scala:294-316`, Scalatra's
  * `FileUploadSupport`); this gives the shim the same wire framing
  * without a servlet container. Byte-exact part bodies (uploads are
  * arbitrary binary: gzip, UTF-8 JSON), CRLF-delimited per the RFC.
  */
private[http] object Multipart {

  final case class Part(name: String, fileName: Option[String], bytes: Array[Byte])

  /** The `boundary` parameter of a `multipart/form-data` Content-Type,
    * unquoted; None when absent (⇒ not parseable as multipart). */
  def boundaryOf(contentType: String): Option[String] =
    contentType.split(';').map(_.trim).collectFirst {
      case p if p.toLowerCase.startsWith("boundary=") =>
        val v = p.substring("boundary=".length)
        if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
          v.substring(1, v.length - 1)
        else v
    }.filter(_.nonEmpty)

  /** Split a multipart body into its parts. Tolerates a missing final
    * CRLF before the closing delimiter; malformed part headers are
    * skipped rather than failed (the caller 400s on a missing required
    * part, mirroring the reference's fileParams lookup). */
  def parse(body: Array[Byte], boundary: String): Seq[Part] = {
    val delim = ("--" + boundary).getBytes(StandardCharsets.ISO_8859_1)
    // RFC 2046: the delimiter is CRLF + "--boundary" (that CRLF belongs to
    // the delimiter, not to the part body); only the very first delimiter
    // may omit the leading CRLF. Anchoring the scan keeps a binary part
    // body that merely contains the boundary bytes mid-line from being
    // mis-split.
    def nextDelim(from: Int): Int = {
      var p = indexOf(body, delim, from)
      while (p > 0 && !(p >= 2 && body(p - 2) == '\r' && body(p - 1) == '\n'))
        p = indexOf(body, delim, p + 1)
      p
    }
    val marks = Iterator.iterate(nextDelim(0))(p =>
      if (p < 0) -1 else nextDelim(p + delim.length))
      .takeWhile(_ >= 0).toSeq
    marks.sliding(2).collect { case Seq(a, b) =>
      val afterDelim = a + delim.length
      // part content: after "--boundary" + its terminating CRLF, up to the
      // CRLF that opens the next delimiter — each stripped only when
      // actually present, so a part not terminated by CRLF stays byte-exact
      val start =
        if (afterDelim + 1 < body.length &&
          body(afterDelim) == '\r' && body(afterDelim + 1) == '\n') afterDelim + 2
        else afterDelim
      val end =
        if (b >= 2 && body(b - 2) == '\r' && body(b - 1) == '\n') math.max(start, b - 2)
        else math.max(start, b)
      if (afterDelim >= body.length || body(afterDelim) == '-') None // closing "--"
      else headerSplit(body, start, end)
    }.flatten.toSeq
  }

  /** Parse one part: headers until CRLFCRLF, then the raw body. */
  private def headerSplit(body: Array[Byte], start: Int, end: Int): Option[Part] = {
    val sep = Array[Byte]('\r', '\n', '\r', '\n')
    val hEnd = indexOf(body, sep, start)
    if (hEnd < 0 || hEnd > end) return None
    val headers = new String(body, start, hEnd - start, StandardCharsets.ISO_8859_1)
    val disposition = headers.split("\r\n")
      .find(_.toLowerCase.startsWith("content-disposition:"))
      .getOrElse(return None)
    // parameter-boundary anchor: a bare `name="…"` pattern would also
    // match the tail of `filename="…"` when the client orders filename
    // first (RFC 7578 imposes no parameter order)
    def param(name: String): Option[String] =
      s"""(?:^|[;\\s])$name="([^"]*)"""".r.findFirstMatchIn(disposition).map(_.group(1))
    param("name").map { n =>
      Part(n, param("filename"),
        java.util.Arrays.copyOfRange(body, hEnd + sep.length, end))
    }
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
