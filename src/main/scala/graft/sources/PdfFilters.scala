package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.Inflater
import scala.collection.mutable

/** PDF stream filter suite (ISO 32000-1 §7.4) — the decoders pdf-reader
  * brings to the reference's implicit contract (`lib/ndr_import/file/pdf.rb`
  * delegates to pdf-reader, whose Flate/LZW/ASCIIHex/ASCII85/RunLength +
  * predictor handling real-world PDFs exercise routinely).
  *
  * Pure byte-in/byte-out functions: Spark-agnostic, executor-side, no state.
  * Unsupported filters (DCT/JPX/CCITT/JBIG2/Crypt — image codecs a text
  * extractor never needs) raise [[PdfFilters.UnsupportedFilterError]] instead
  * of silently yielding empty pages.
  */
private[sources] object PdfFilters {

  final class UnsupportedFilterError(val filter: String)
    extends RuntimeException(s"Unsupported PDF stream filter /$filter")

  /** Decode parameters (`/DecodeParms`, §7.4.4.3): predictor family and
    * sample geometry, plus LZW's EarlyChange. */
  final case class Parms(predictor: Int = 1, colors: Int = 1,
                         bitsPerComponent: Int = 8, columns: Int = 1,
                         earlyChange: Int = 1)

  /** Parse a `<< /Predictor 12 /Columns 5 ... >>` parms dict body. */
  def parseParms(dict: String): Parms = {
    def intOf(key: String, default: Int): Int =
      (java.util.regex.Pattern.quote(key) + "\\s+(\\d+)").r
        .findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(default)
    Parms(
      predictor = intOf("/Predictor", 1),
      colors = intOf("/Colors", 1),
      bitsPerComponent = intOf("/BitsPerComponent", 8),
      columns = intOf("/Columns", 1),
      earlyChange = intOf("/EarlyChange", 1))
  }

  /** Apply one named filter. Predictor-capable filters (Flate, LZW) run the
    * predictor pass afterwards. */
  def apply(name: String, data: Array[Byte], parms: Parms): Array[Byte] =
    name match {
      case "FlateDecode" | "Fl"     => unpredict(inflate(data), parms)
      case "LZWDecode" | "LZW"      => unpredict(lzw(data, parms.earlyChange), parms)
      case "ASCIIHexDecode" | "AHx" => asciiHex(data)
      case "ASCII85Decode" | "A85"  => ascii85(data)
      case "RunLengthDecode" | "RL" => runLength(data)
      case other                    => throw new UnsupportedFilterError(other)
    }

  // ------------------------------------------------------------------ flate

  def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](16 * 1024)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return out.toByteArray
      }
      out.toByteArray
    } catch { case _: Exception => out.toByteArray }
    finally inf.end()
  }

  // -------------------------------------------------------------------- lzw

  /** PDF LZW (§7.4.4.2): 9→12-bit codes, 256 = clear table, 257 = EOD;
    * EarlyChange=1 (default) widens the code one entry early. */
  def lzw(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, data.length * 4))
    val dict = mutable.ArrayBuffer.empty[Array[Byte]]
    def reset(): Unit = {
      dict.clear()
      var b = 0
      while (b < 256) { dict += Array(b.toByte); b += 1 }
      dict += null; dict += null // 256 clear, 257 EOD placeholders
    }
    reset()
    var codeWidth = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    while (i < data.length) {
      bitBuf = (bitBuf << 8) | (data(i) & 0xFF); bitCnt += 8
      i += 1
      while (bitCnt >= codeWidth) {
        val code = ((bitBuf >>> (bitCnt - codeWidth)) & ((1L << codeWidth) - 1)).toInt
        bitCnt -= codeWidth
        if (code == 256) { reset(); codeWidth = 9; prev = null }
        else if (code == 257) { return out.toByteArray }
        else {
          val entry =
            if (code < dict.length && dict(code) != null) dict(code)
            else if (prev != null) prev :+ prev(0) // the KwKwK case
            else throw new IllegalArgumentException(s"Bad LZW code $code")
          out.write(entry, 0, entry.length)
          if (prev != null) dict += (prev :+ entry(0))
          prev = entry
          if (dict.length >= (1 << codeWidth) - earlyChange && codeWidth < 12)
            codeWidth += 1
        }
      }
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- ascii hex

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` is EOD,
    * odd final digit padded with 0. */
  def asciiHex(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else {
        val d = Character.digit(c, 16)
        if (d >= 0) {
          if (hi < 0) hi = d
          else { out.write((hi << 4) | d); hi = -1 }
        } else if (!Character.isWhitespace(c))
          throw new IllegalArgumentException(s"Bad ASCIIHex character '$c'")
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd digit → pad 0
    out.toByteArray
  }

  // --------------------------------------------------------------- ascii 85

  /** ASCII85Decode (§7.4.3): 5 chars ('!'..'u') → 4 bytes base-85; 'z' = four
    * zero bytes; `~>` is EOD; a trailing group of n chars yields n-1 bytes. */
  def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val group = new Array[Int](5)
    var gi = 0
    var i = 0
    // optional <~ header (not part of the PDF spec but emitted by some tools)
    if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
    var done = false
    def flush(n: Int): Unit = { // n chars in group (2..5) → n-1 bytes
      var k = gi
      while (k < 5) { group(k) = 84; k += 1 } // pad with 'u'
      var v = 0L
      k = 0
      while (k < 5) { v = v * 85 + group(k); k += 1 }
      val bytes = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
                        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      out.write(bytes, 0, n - 1)
    }
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && gi == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (c >= '!' && c <= 'u') {
        group(gi) = c - '!'
        gi += 1
        if (gi == 5) { flush(5); gi = 0 }
      } else if (!Character.isWhitespace(c))
        throw new IllegalArgumentException(s"Bad ASCII85 character '$c'")
      i += 1
    }
    if (gi == 1) throw new IllegalArgumentException("Truncated ASCII85 group")
    if (gi > 1) flush(gi)
    out.toByteArray
  }

  // ------------------------------------------------------------- run length

  /** RunLengthDecode (§7.4.5): length byte L — 0..127 copy L+1 literal
    * bytes; 129..255 repeat the next byte 257-L times; 128 is EOD. */
  def runLength(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(math.max(64, data.length * 2))
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xFF
      i += 1
      if (l == 128) done = true
      else if (l < 128) {
        val n = math.min(l + 1, data.length - i)
        out.write(data, i, n)
        i += n
      } else if (i < data.length) {
        val b = data(i)
        i += 1
        var k = 0
        while (k < 257 - l) { out.write(b); k += 1 }
      }
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- predictor

  /** Undo a /Predictor pass (§7.4.4.4): 1 = none, 2 = TIFF horizontal
    * differencing, ≥10 = PNG per-row filters (None/Sub/Up/Average/Paeth —
    * the row's first byte names its filter, like PNG proper). Common in
    * xref streams and content emitted by pdf writers that Flate with
    * Predictor 12. */
  def unpredict(data: Array[Byte], p: Parms): Array[Byte] = {
    if (p.predictor <= 1) return data
    val bpp = math.max(1, p.colors * p.bitsPerComponent / 8)
    val rowLen = (p.colors * p.bitsPerComponent * p.columns + 7) / 8
    if (p.predictor == 2) { // TIFF: byte-aligned components only
      if (p.bitsPerComponent != 8) return data // sub-byte TIFF: pass through
      val out = data.clone()
      var r = 0
      while (r * rowLen < out.length) {
        val base = r * rowLen
        var i = bpp
        while (i < rowLen && base + i < out.length) {
          out(base + i) = ((out(base + i) + out(base + i - bpp)) & 0xFF).toByte
          i += 1
        }
        r += 1
      }
      out
    } else { // PNG family: each row prefixed by a filter-type byte
      val stride = rowLen + 1
      val nRows = data.length / stride
      val out = new Array[Byte](nRows * rowLen)
      val prior = new Array[Byte](rowLen)
      var r = 0
      while (r < nRows) {
        val ft = data(r * stride) & 0xFF
        val row = new Array[Byte](rowLen)
        System.arraycopy(data, r * stride + 1, row, 0, rowLen)
        var i = 0
        while (i < rowLen) {
          val left = if (i >= bpp) row(i - bpp) & 0xFF else 0
          val up = prior(i) & 0xFF
          val upLeft = if (i >= bpp) prior(i - bpp) & 0xFF else 0
          val recon = ft match {
            case 0 => row(i) & 0xFF
            case 1 => (row(i) & 0xFF) + left
            case 2 => (row(i) & 0xFF) + up
            case 3 => (row(i) & 0xFF) + (left + up) / 2
            case 4 =>
              val pa = math.abs(up - upLeft)
              val pb = math.abs(left - upLeft)
              val pc = math.abs(left + up - 2 * upLeft)
              val pred = if (pa <= pb && pa <= pc) left
                         else if (pb <= pc) up else upLeft
              (row(i) & 0xFF) + pred
            case other =>
              throw new IllegalArgumentException(s"Bad PNG filter type $other")
          }
          row(i) = (recon & 0xFF).toByte
          i += 1
        }
        System.arraycopy(row, 0, out, r * rowLen, rowLen)
        System.arraycopy(row, 0, prior, 0, rowLen)
        r += 1
      }
      out
    }
  }
}
