package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater

/** PDF stream filters (ISO 32000-1 §7.4): LZW (spec example vector),
  * ASCIIHex, ASCII85, RunLength, PNG/TIFF predictors, filter chains —
  * plus the page-scoped error contract for unsupported filters
  * (`helpers/file/pdf.rb:10-25`). */
class PdfFiltersSpec extends AnyFunSuite {

  private def s2b(s: String) = s.getBytes("ISO-8859-1")

  // --------------------------------------------------------------- LZW

  test("lzw: ISO 32000-1 §7.4.4.2 example vector decodes") {
    // codes 256,45,258,258,65,259,66,257 = bytes 80 0B 60 50 22 0C 0C 85 01
    val encoded = Array(0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01)
      .map(_.toByte)
    val expected = Array.fill(5)(45.toByte) ++ Array(65.toByte) ++
      Array.fill(3)(45.toByte) ++ Array(66.toByte)
    assert(PdfFilters.lzw(encoded, earlyChange = 1).toSeq == expected.toSeq)
  }

  /** Minimal PDF LZW encoder (EarlyChange=1) for round-trip tests. */
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val dict = collection.mutable.HashMap.empty[Seq[Byte], Int]
    def reset(): Unit = {
      dict.clear(); (0 until 256).foreach(b => dict(Seq(b.toByte)) = b)
    }
    reset()
    var nextCode = 258
    var codeWidth = 9
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeWidth) | code; bitCnt += codeWidth
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xFF).toInt); bitCnt -= 8
      }
    }
    put(256)
    var cur = Seq.empty[Byte]
    data.foreach { b =>
      val nxt = cur :+ b
      if (dict.contains(nxt)) cur = nxt
      else {
        put(dict(cur))
        dict(nxt) = nextCode; nextCode += 1
        // the encoder's table runs one entry ahead of the decoder's, so it
        // widens when (nextCode - 1) hits the decoder's EarlyChange=1
        // threshold 2^w - 1
        if (nextCode - 1 >= (1 << codeWidth) - 1 && codeWidth < 12) codeWidth += 1
        cur = Seq(b)
      }
    }
    if (cur.nonEmpty) put(dict(cur))
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xFF).toInt)
    out.toByteArray
  }

  test("lzw: round-trips text larger than one code width") {
    val text = ("the quick brown fox jumps over the lazy dog. " * 200).getBytes("UTF-8")
    assert(PdfFilters.lzw(lzwEncode(text), earlyChange = 1).toSeq == text.toSeq)
  }

  // ---------------------------------------------------------- ASCIIHex

  test("asciiHex: pairs, whitespace, EOD, odd-digit padding") {
    assert(new String(PdfFilters.asciiHex(s2b("48 65 6C\n6C 6F>")), "UTF-8") == "Hello")
    assert(PdfFilters.asciiHex(s2b("7>")).toSeq == Seq(0x70.toByte)) // odd → pad 0
    intercept[IllegalArgumentException](PdfFilters.asciiHex(s2b("4G>")))
  }

  // ---------------------------------------------------------- ASCII85

  test("ascii85: known vector, z shorthand, partial group") {
    // "Man is d" -> "9jqo^BlbD-" (the classic Leviathan vector)
    assert(new String(PdfFilters.ascii85(s2b("9jqo^BlbD-~>")), "UTF-8") == "Man is d")
    // partial trailing group (13 bytes = 3 groups + 2 extra chars): round-trip
    val msg = s2b("Hello, World!")
    assert(PdfFilters.ascii85(s2b(encode85(msg) + "~>")).toSeq == msg.toSeq)
    assert(PdfFilters.ascii85(s2b("z~>")).toSeq == Seq[Byte](0, 0, 0, 0))
    intercept[IllegalArgumentException](PdfFilters.ascii85(s2b("|~>")))
  }

  // --------------------------------------------------------- RunLength

  test("runLength: literal copy, run expansion, EOD") {
    // 2 → copy 3 literals; 254 → repeat next byte 257-254=3 times; 128 EOD
    val in = Array[Byte](2, 'a', 'b', 'c', 254.toByte, 'x', 128.toByte, 'Z')
    assert(new String(PdfFilters.runLength(in), "UTF-8") == "abcxxx")
  }

  // -------------------------------------------------------- predictors

  test("png predictors: sub, up, average, paeth rows reconstruct") {
    // columns=4, colors=1, bpc=8 → rowLen 4, bpp 1
    val parms = PdfFilters.Parms(predictor = 12, columns = 4)
    val raw = Array[Byte](
      1, 10, 5, 5, 5,      // sub:   10, 15, 20, 25
      2, 1, 1, 1, 1,       // up:    11, 16, 21, 26
      3, 5, 8, 10, 12,     // avg:   5+(0+11)/2=10, 8+(10+16)/2=21, 10+(21+21)/2=31, 12+(31+26)/2=40
      4, 1, 1, 1, 1)       // paeth
    val out = PdfFilters.unpredict(raw, parms)
    assert(out.slice(0, 4).toSeq == Seq[Byte](10, 15, 20, 25))
    assert(out.slice(4, 8).toSeq == Seq[Byte](11, 16, 21, 26))
    assert(out.slice(8, 12).toSeq == Seq[Byte](10, 21, 31, 40))
    // paeth row: left/up/upleft predictor per cell over row3
    // cell0: left=0 up=10 ul=0 → p=10 → 11; cell1: left=11 up=21 ul=10:
    // pa=|21-10|=11 pb=|11-10|=1 pc=|11+21-20|=12 → up=21 → 22
    assert(out.slice(12, 14).toSeq == Seq[Byte](11, 22))
  }

  test("tiff predictor 2: horizontal differencing") {
    val parms = PdfFilters.Parms(predictor = 2, columns = 4)
    val raw = Array[Byte](10, 5, 5, 5, 1, 2, 3, 4)
    val out = PdfFilters.unpredict(raw, parms)
    assert(out.toSeq == Seq[Byte](10, 15, 20, 25, 1, 3, 6, 10))
  }

  // -------------------------------------------------- end-to-end (Pdf)

  private def onePagePdf(streamDict: String, data: Array[Byte]): Array[Byte] = {
    val head = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj $streamDict stream\n").getBytes("ISO-8859-1")
    head ++ data ++ s2b("\nendstream endobj\n%%EOF")
  }

  private val content = "BT (Filtered hello) Tj ET"

  test("pdf end-to-end: LZW-encoded content stream extracts") {
    val pdf = onePagePdf("<< /Filter /LZWDecode >>", lzwEncode(s2b(content)))
    assert(Pdf.extractTextLines(pdf) == Seq("Filtered hello"))
  }

  test("pdf end-to-end: ASCIIHex and ASCII85+Flate filter chains extract") {
    val hex = content.getBytes("ISO-8859-1")
      .map(b => f"${b & 0xFF}%02X").mkString + ">"
    val pdf = onePagePdf("<< /Filter /ASCIIHexDecode >>", s2b(hex))
    assert(Pdf.extractTextLines(pdf) == Seq("Filtered hello"))

    // chain: deflate then ascii85-wrap; PDF declares [/ASCII85Decode /FlateDecode]
    val d = new Deflater(); d.setInput(s2b(content)); d.finish()
    val buf = new Array[Byte](1024); val n = d.deflate(buf)
    val a85 = encode85(buf.take(n)) + "~>"
    val pdf2 = onePagePdf("<< /Filter [/ASCII85Decode /FlateDecode] >>", s2b(a85))
    assert(Pdf.extractTextLines(pdf2) == Seq("Filtered hello"))
  }

  test("pdf end-to-end: Flate with PNG up-predictor content stream extracts") {
    val plain = s2b(content)
    val cols = 5
    val rowLen = cols
    val padded = plain ++ Array.fill((rowLen - plain.length % rowLen) % rowLen)(' '.toByte)
    // forward-predict with filter type 2 (up) per row
    val rows = padded.grouped(rowLen).toSeq
    val out = new ByteArrayOutputStream()
    var prior = new Array[Byte](rowLen)
    rows.foreach { r =>
      out.write(2)
      r.indices.foreach(i => out.write((r(i) - prior(i)) & 0xFF))
      prior = r
    }
    val d = new Deflater(); d.setInput(out.toByteArray); d.finish()
    val buf = new Array[Byte](4096); val n = d.deflate(buf)
    val pdf = onePagePdf(
      s"<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >> >>",
      buf.take(n))
    assert(Pdf.extractTextLines(pdf) == Seq("Filtered hello"))
  }

  test("pdf: unsupported filter raises a page-scoped error, never empty pages") {
    val pdf = onePagePdf("<< /Filter /DCTDecode >>", Array[Byte](1, 2, 3))
    val e = intercept[RuntimeException](Pdf.extractTextLines(pdf, "scan.pdf"))
    assert(e.getMessage.contains("Invalid format on page 1 of scan.pdf"), e.getMessage)
    assert(e.getMessage.contains("DCTDecode"), e.getMessage)
  }

  // ------------------------------------------ seeded round-trip properties

  private def randomArrays(seed: Long, n: Int, maxLen: Int): Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(seed)
    // mix of uniform noise and run-heavy data (exercises RLE/LZW dictionaries)
    (0 until n).map { i =>
      val len = rnd.nextInt(maxLen + 1)
      val a = new Array[Byte](len)
      if (i % 2 == 0) rnd.nextBytes(a)
      else {
        var j = 0
        while (j < len) {
          val run = math.min(1 + rnd.nextInt(200), len - j)
          val b = rnd.nextInt(256).toByte
          java.util.Arrays.fill(a, j, j + run, b)
          j += run
        }
      }
      a
    }
  }

  test("property: asciiHex/ascii85/runLength/lzw round-trip random data") {
    def hexEncode(d: Array[Byte]): Array[Byte] =
      s2b(d.map(b => f"${b & 0xFF}%02X").mkString + ">")
    def rleEncode(d: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < d.length) {
        var run = 1
        while (i + run < d.length && d(i + run) == d(i) && run < 128) run += 1
        if (run >= 2) { out.write(257 - run); out.write(d(i)); i += run }
        else {
          var lit = 1
          while (i + lit < d.length && lit < 128 &&
            (i + lit + 1 >= d.length || d(i + lit) != d(i + lit + 1))) lit += 1
          out.write(lit - 1); out.write(d, i, lit); i += lit
        }
      }
      out.write(128); out.toByteArray
    }
    for (data <- randomArrays(seed = 42, n = 40, maxLen = 2000)) {
      assert(PdfFilters.asciiHex(hexEncode(data)).toSeq == data.toSeq)
      assert(PdfFilters.ascii85(s2b(encode85(data) + "~>")).toSeq == data.toSeq)
      assert(PdfFilters.runLength(rleEncode(data)).toSeq == data.toSeq)
      assert(PdfFilters.lzw(lzwEncode(data), earlyChange = 1).toSeq == data.toSeq)
    }
  }

  test("property: png predictors round-trip random rows") {
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 20) {
      val cols = 1 + rnd.nextInt(16)
      val rows = 1 + rnd.nextInt(12)
      val raw = new Array[Byte](rows * cols)
      rnd.nextBytes(raw)
      val enc = new java.io.ByteArrayOutputStream()
      for (r <- 0 until rows) {
        val t = rnd.nextInt(5) // 0=none 1=sub 2=up 3=average 4=paeth
        enc.write(t)
        for (c <- 0 until cols) {
          val cur = raw(r * cols + c) & 0xFF
          val left = if (c > 0) raw(r * cols + c - 1) & 0xFF else 0
          val up = if (r > 0) raw((r - 1) * cols + c) & 0xFF else 0
          val ul = if (r > 0 && c > 0) raw((r - 1) * cols + c - 1) & 0xFF else 0
          val pred = t match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          enc.write((cur - pred) & 0xFF)
        }
      }
      val parms = PdfFilters.Parms(predictor = 15, columns = cols)
      assert(PdfFilters.unpredict(enc.toByteArray, parms).toSeq == raw.toSeq,
        s"cols=$cols rows=$rows")
    }
  }

  /** Reference ASCII85 encoder for the chain test. */
  private def encode85(data: Array[Byte]): String = {
    val sb = new StringBuilder
    data.grouped(4).foreach { g =>
      val padded = g.padTo(4, 0.toByte)
      var v = 0L
      padded.foreach(b => v = (v << 8) | (b & 0xFF))
      if (v == 0 && g.length == 4) sb += 'z'
      else {
        val digits = new Array[Char](5)
        var k = 4
        while (k >= 0) { digits(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
        sb ++= new String(digits).take(g.length + 1)
      }
    }
    sb.toString
  }
}
