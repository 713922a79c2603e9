package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{Inflater, ZipInputStream}

/**
 * Pure-JVM text extraction for the two binary formats the reference's
 * upload path handles (S12/S13 — day_10/utils/text_processor.py:277-309,
 * day_15/main.py:69-79, which use python-docx / PyPDF2). The container
 * ships no PDFBox/POI, so these are minimal REAL parsers over the public
 * file formats themselves:
 *
 *  - DOCX (ECMA-376): a zip container; body text lives in
 *    `word/document.xml` as `<w:t>` runs inside `<w:p>` paragraphs, with
 *    `<w:tab/>` and `<w:br/>` inline. Parsed with the JDK's StAX reader
 *    (namespace-tolerant, DTD/external entities disabled).
 *  - PDF (ISO 32000): text is drawn by content streams' `Tj`/`TJ`/`'`/`"`
 *    operators between BT/ET; streams may be /FlateDecode-compressed
 *    (inflated with java.util.zip). Covers the simple-font, non-CID PDFs
 *    the reference's own pipeline targets; exotic encodings fall back to
 *    whatever bytes the strings carry.
 *
 * Both throw nothing: malformed input degrades to "" (the reference's
 * loaders likewise swallow per-file parse errors into empty text).
 */
object BinaryText {

  // ------------------------------------------------------------------ docx

  object DocxTextExtractor extends DocumentLoader.BinaryTextExtractor {
    def extract(path: String, bytes: Array[Byte]): String = {
      if (bytes == null) return ""
      try {
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        try {
          var entry = zin.getNextEntry
          while (entry != null) {
            if (entry.getName == "word/document.xml")
              return parseDocumentXml(readAll(zin))
            entry = zin.getNextEntry
          }
          ""
        } finally zin.close()
      } catch { case _: Exception => "" }
    }

    private def readAll(in: java.io.InputStream): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    }

    private def parseDocumentXml(xml: Array[Byte]): String = {
      import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
      val f = XMLInputFactory.newInstance()
      // XXE hardening: no DTDs, no external entities
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      val r = f.createXMLStreamReader(new ByteArrayInputStream(xml))
      val sb = new StringBuilder
      var inT = false
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "t" => inT = true
                case "tab" => sb.append('\t')
                case "br" | "cr" => sb.append('\n')
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
              if (inT) sb.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "t" => inT = false
                case "p" => sb.append('\n')
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      sb.toString.replaceAll("\\n+$", "")
    }
  }

  // ------------------------------------------------------------------- pdf

  object PdfTextExtractor extends DocumentLoader.BinaryTextExtractor {
    def extract(path: String, bytes: Array[Byte]): String = {
      if (bytes == null) return ""
      try {
        val out = new StringBuilder
        contentStreams(bytes).foreach { content =>
          val text = parseContentStream(content)
          if (text.nonEmpty) {
            if (out.nonEmpty) out.append('\n')
            out.append(text)
          }
        }
        out.toString
      } catch { case _: Exception => "" }
    }

    /** Slice out every `stream … endstream` segment, inflating
      * /FlateDecode ones; keep those that look like content streams (BT). */
    private def contentStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val raw = new String(bytes, "ISO-8859-1")
      val out = Seq.newBuilder[Array[Byte]]
      var from = 0
      while ({ val i = raw.indexOf("stream", from); i >= 0 && {
        val si = i
        // keyword must be "stream", not "endstream"
        val isEnd = si >= 3 && raw.regionMatches(si - 3, "end", 0, 3)
        var dataStart = si + "stream".length
        if (dataStart < raw.length && raw.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < raw.length && raw.charAt(dataStart) == '\n') dataStart += 1
        val ei = raw.indexOf("endstream", dataStart)
        if (!isEnd && ei > dataStart) {
          val dict = raw.substring(math.max(0, si - 300), si)
          var data = java.util.Arrays.copyOfRange(bytes, dataStart, ei)
          // strip the EOL that precedes "endstream"
          var end = data.length
          while (end > 0 && (data(end - 1) == '\n' || data(end - 1) == '\r')) end -= 1
          data = java.util.Arrays.copyOf(data, end)
          val decoded =
            if (dict.contains("/FlateDecode")) inflate(data) else Some(data)
          decoded.foreach { d =>
            if (new String(d, "ISO-8859-1").contains("BT")) out += d
          }
          from = ei + "endstream".length
          true
        } else if (ei > 0) { from = ei + "endstream".length; true }
        else false
      }}) ()
      out.result()
    }

    private def inflate(data: Array[Byte]): Option[Array[Byte]] =
      try {
        val inf = new Inflater()
        inf.setInput(data)
        val out = new java.io.ByteArrayOutputStream(data.length * 4)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput()) throw new java.io.EOFException()
          out.write(buf, 0, n)
        }
        inf.end()
        Some(out.toByteArray)
      } catch { case _: Exception => None }

    /** Tokenize a decoded content stream and replay its text operators:
      * operands collect on a stack; `Tj`/`'`/`"` show one string, `TJ`
      * shows an array's strings, `Td`/`TD`/`T*`/`'` start a new line. */
    private def parseContentStream(content: Array[Byte]): String = {
      val s = new String(content, "ISO-8859-1")
      val sb = new StringBuilder
      val strings = collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      val n = s.length
      def newline(): Unit =
        if (sb.nonEmpty && sb.last != '\n') sb.append('\n')

      while (i < n) {
        val c = s.charAt(i)
        if (c == '%') { // comment to EOL
          while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
        } else if (c == '(') {
          val (str, next) = parseLiteralString(s, i)
          strings += str
          i = next
        } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
          val (str, next) = parseHexString(s, i)
          strings += str
          i = next
        } else if (c == '<' || c == '>') { // dict delimiters
          i += 1
        } else if (c == '/' ) { // name
          i += 1
          while (i < n && !isDelim(s.charAt(i))) i += 1
        } else if (c == '[') { // array start: strings inside accumulate
          i += 1
        } else if (c == ']') {
          i += 1
        } else if (c.isWhitespace) {
          i += 1
        } else if (c == '+' || c == '-' || c == '.' || c.isDigit) {
          i += 1
          while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        } else { // operator token
          val start = i
          while (i < n && !isDelim(s.charAt(i))) i += 1
          // A stray unmatched delimiter (')', '{', '}') yields a width-0
          // token; skip the character so the scan always advances.
          if (i == start) i += 1
          s.substring(start, math.min(i, n)) match {
            case "Tj" =>
              strings.lastOption.foreach(sb.append)
              strings.clear()
            case "TJ" =>
              strings.foreach(sb.append)
              strings.clear()
            case "'" =>
              newline()
              strings.lastOption.foreach(sb.append)
              strings.clear()
            case "\"" =>
              newline()
              strings.lastOption.foreach(sb.append)
              strings.clear()
            case "Td" | "TD" | "T*" =>
              newline()
              strings.clear()
            case "BT" | "ET" =>
              newline()
              strings.clear()
            case _ =>
              strings.clear()
          }
        }
      }
      sb.toString.replaceAll("\\n+$", "").replaceAll("^\\n+", "")
    }

    private def isDelim(c: Char): Boolean =
      c.isWhitespace || "()<>[]{}/%".indexOf(c) >= 0

    /** `(...)` literal with \-escapes, octal codes, and nested parens. */
    private def parseLiteralString(s: String, open: Int): (String, Int) = {
      val sb = new StringBuilder
      var depth = 1
      var i = open + 1
      while (i < s.length && depth > 0) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\n' => i += 2 // line continuation
            case d if d >= '0' && d <= '7' =>
              var j = i + 1
              var v = 0
              while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append(v.toChar); i = j
            case other => sb.append(other); i += 2
          }
        } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
        else { sb.append(c); i += 1 }
      }
      (sb.toString, i)
    }

    /** `<hex>` string: pairs of hex digits, odd final digit padded with 0. */
    private def parseHexString(s: String, open: Int): (String, Int) = {
      val sb = new StringBuilder
      var i = open + 1
      val hex = new StringBuilder
      while (i < s.length && s.charAt(i) != '>') {
        val c = s.charAt(i)
        if (!c.isWhitespace) hex.append(c)
        i += 1
      }
      if (hex.length % 2 == 1) hex.append('0')
      var j = 0
      while (j < hex.length) {
        sb.append(Integer.parseInt(hex.substring(j, j + 2), 16).toChar)
        j += 2
      }
      (sb.toString, i + 1)
    }
  }

  /** Extension dispatch (the day_10 loader's routing): .pdf and .docx get
    * the real parsers; anything else falls back to printable-ASCII
    * recovery. */
  object ExtensionDispatchExtractor extends DocumentLoader.BinaryTextExtractor {
    def extract(path: String, bytes: Array[Byte]): String = {
      val lower = if (path == null) "" else path.toLowerCase
      if (lower.endsWith(".pdf")) PdfTextExtractor.extract(path, bytes)
      else if (lower.endsWith(".docx")) DocxTextExtractor.extract(path, bytes)
      else DocumentLoader.PrintableAsciiExtractor.extract(path, bytes)
    }
  }
}
