package graft.catalog

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.ZipFile

import scala.jdk.CollectionConverters._

import org.w3c.dom.Element

/** Minimal driver-side .xlsx → .csv pre-converter (the reference loads
  * .xlsx via pandas, `core/utils.py:157-186`; no spreadsheet library
  * ships here, and an .xlsx is just a zip of XML). Parses the first
  * worksheet with the JDK's DOM parser: shared strings, inline
  * strings, and raw numeric/boolean cell values; sparse rows are
  * padded by the cell reference column index.
  *
  * Spreadsheets are driver-sized by nature (the reference materializes
  * them through pandas the same way); the DISTRIBUTED load happens on
  * the converted CSV through `spark.read`.
  *
  * The default output is a driver-local temp file (deleted on JVM
  * exit): fine for local mode and shared filesystems — the same
  * constraint the reference's pandas path has. On a multi-node cluster
  * without a shared FS, pass `csvPath` pointing at cluster storage so
  * executors can read the converted file.
  */
object XlsxConvert {

  /** Convert `xlsxPath`'s first worksheet to a CSV file; returns the
    * CSV path (a sibling temp file unless `csvPath` is given).
    */
  def toCsv(xlsxPath: String, csvPath: Option[String] = None): String = {
    val zip = new ZipFile(new File(xlsxPath))
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml")).map { e =>
        val doc = parse(zip.getInputStream(e))
        elems(doc.getDocumentElement, "si").map(si => text(si)).toIndexedSeq
      }.getOrElse(IndexedSeq.empty)

      val sheetName = zip.entries().asScala.map(_.getName)
        .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
        .toSeq.minByOption(n => n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml")
          .toIntOption.getOrElse(Int.MaxValue))
        .getOrElse(throw new IllegalArgumentException(s"no worksheet in $xlsxPath"))
      val sheet = parse(zip.getInputStream(zip.getEntry(sheetName)))

      val rows = elems(sheet.getDocumentElement, "row").map { row =>
        // the r= cell reference is optional (ECMA-376): an unreferenced
        // cell is positional — it follows the previous cell in the row
        var next = 0
        elems(row, "c").map { c =>
          val ref = colIndex(c.getAttribute("r"))
          val colIdx = if (ref >= 0) ref else next
          next = colIdx + 1
          colIdx -> cellValue(c, shared)
        }
      }
      val width = rows.flatMap(_.map(_._1)).maxOption.getOrElse(-1) + 1
      val lines = rows.map { cells =>
        val arr = Array.fill(width)("")
        cells.foreach { case (i, v) => if (i >= 0 && i < width) arr(i) = v }
        arr.map(csvQuote).mkString(",")
      }

      val out = csvPath.getOrElse {
        val f = Files.createTempFile(
          Paths.get(xlsxPath).getFileName.toString.replaceAll("\\.[^.]+$", "") + "_", ".csv")
        f.toFile.deleteOnExit()
        f.toString
      }
      Files.write(Paths.get(out),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
      out
    } finally zip.close()
  }

  private def parse(in: java.io.InputStream): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    // spreadsheet XML needs no DTD/external entities — lock them out
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(in)
  }

  /** Direct+nested descendants with the local tag name (namespace-agnostic). */
  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName("*")
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      .filter(e => localName(e) == tag)
  }

  private def localName(e: Element): String =
    Option(e.getLocalName).getOrElse(e.getTagName.split(":").last)

  /** Concatenated text of the `t` descendants that carry the value —
    * rich-text runs split a shared string across several `t` nodes, but
    * `t` nodes under `rPh` are phonetic guides (furigana in East Asian
    * workbooks), not cell content, and must be excluded.
    */
  private def text(si: Element): String =
    elems(si, "t").filterNot(underPhonetic(_, si)).map(_.getTextContent).mkString

  private def underPhonetic(t: Element, stop: Element): Boolean = {
    var p = t.getParentNode
    while (p != null && p != stop) {
      p match {
        case e: Element if localName(e) == "rPh" => return true
        case _ => ()
      }
      p = p.getParentNode
    }
    false
  }

  /** "BC23" → 0-based column 54; empty/missing ref → -1 (caller treats
    * the cell as positional, following the previous cell).
    */
  private[catalog] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter).toUpperCase
    if (letters.isEmpty) -1
    else letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def cellValue(c: Element, shared: IndexedSeq[String]): String = {
    val t = c.getAttribute("t")
    def v = elems(c, "v").headOption.map(_.getTextContent).getOrElse("")
    t match {
      case "s" => v.toIntOption.flatMap(shared.lift).getOrElse("")
      case "inlineStr" => elems(c, "is").headOption.map(text).getOrElse("")
      case "b" => if (v == "1") "true" else "false"
      case _ => v // numbers, formula results ("str"), plain values
    }
  }

  private[catalog] def csvQuote(s: String): String =
    if (s.exists(ch => ch == ',' || ch == '"' || ch == '\n' || ch == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s
}
