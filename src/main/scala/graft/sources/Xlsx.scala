package graft.sources

import java.util.zip.ZipFile
import scala.util.Using
import scala.xml.XML

/** Minimal SpreadsheetML (.xlsx) reader — enough to ingest the
  * reference's validation-params workbooks (SURVEY §2.1 S6;
  * `storage_utils.py:92-96` downloads the xlsx and flattens it to CSV
  * with pandas before the same row-wise parse). An xlsx file is a zip
  * of XML parts; the two parts that matter for a params sheet are the
  * first worksheet (`xl/worksheets/sheet1.xml`) and the shared-string
  * table (`xl/sharedStrings.xml`). No external library needed —
  * java.util.zip + scala-xml (on the Spark classpath) cover it.
  *
  * Config workbooks are a few hundred cells read once on the driver,
  * so a DOM parse is the right tool; this is NOT a data-plane reader.
  *
  * Supported cell types: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula/numeric/boolean values (the raw `<v>`
  * text — matching what pandas' csv round-trip yields for the params
  * sheets, which hold only strings and plain numbers).
  */
object Xlsx {

  /** The first worksheet as a dense row-major grid of cell strings
    * (missing cells filled with ""). Trailing empty rows dropped. */
  def rows(path: String): Seq[Seq[String]] =
    Using.resource(new ZipFile(path)) { zip =>
      def part(name: String): Option[scala.xml.Elem] =
        Option(zip.getEntry(name)).map(e =>
          Using.resource(zip.getInputStream(e))(XML.load))

      val shared: IndexedSeq[String] = part("xl/sharedStrings.xml")
        .map(ss => (ss \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
        .getOrElse(IndexedSeq.empty)

      val sheetName = {
        import scala.jdk.CollectionConverters._
        val sheets = zip.entries().asScala.map(_.getName)
          .filter(n => n.startsWith("xl/worksheets/") && n.endsWith(".xml"))
          .toSeq.sorted
        require(sheets.nonEmpty, s"no worksheet part in $path")
        sheets.head
      }
      val sheet = part(sheetName).getOrElse(
        throw new IllegalArgumentException(s"unreadable worksheet $sheetName in $path"))

      val parsed: Seq[(Int, Map[Int, String])] = (sheet \ "sheetData" \ "row")
        .zipWithIndex.map { case (row, i) =>
          val rowIdx = row.attribute("r").map(_.text.toInt - 1).getOrElse(i)
          val cells = (row \ "c").zipWithIndex.map { case (c, j) =>
            val colIdx = c.attribute("r").map(r => colOf(r.text)).getOrElse(j)
            val v = c.attribute("t").map(_.text) match {
              case Some("s")         => shared((c \ "v").text.trim.toInt)
              case Some("inlineStr") => (c \ "is" \\ "t").map(_.text).mkString
              case _                 => (c \ "v").text
            }
            colIdx -> v
          }.toMap
          rowIdx -> cells
        }

      if (parsed.isEmpty) Seq.empty
      else {
        val lastRow = parsed.map(_._1).max
        val width = (parsed.flatMap(_._2.keys) :+ 0).max + 1
        val byRow = parsed.toMap
        (0 to lastRow).map { r =>
          val cells = byRow.getOrElse(r, Map.empty)
          (0 until width).map(c => cells.getOrElse(c, ""))
        }.reverse.dropWhile(_.forall(_.isEmpty)).reverse
      }
    }

  /** "B3" → 1; "AA7" → 26 (column letters only; row digits ignored). */
  private[sources] def colOf(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    require(letters.nonEmpty, s"bad cell ref: $ref")
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }
}
