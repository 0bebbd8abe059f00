package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Distributed XLSX read/write with zero extra dependencies.
  *
  * The reference ingests Excel workbooks (helpers/from_excel.py:11-24 —
  * pandas.read_excel → a frame the engine queries). POI / spark-excel jars
  * are not in this build, but .xlsx is just a ZIP of small XML parts, and
  * the JDK ships both `java.util.zip` and a StAX pull parser — so the
  * format is implemented here directly, shaped like AvroIO/ArrowIO:
  *
  *  - WRITE: one standard .xlsx workbook per partition through the Hadoop
  *    filesystem API (shared-FS ready). Strings are written as inline
  *    strings and numerics as native number cells, so Excel, pandas and
  *    openpyxl open the files as-is.
  *  - READ: `binaryFile` scan (Spark schedules/splits by file) + per-file
  *    StAX parse in `mapPartitions` — the decode is the only imperative
  *    seam; everything downstream stays declarative. Both inline-string
  *    and sharedStrings workbooks are handled, so externally-produced
  *    files (openpyxl/Excel default to sharedStrings) read fine.
  *
  * Excel semantics mirrored from the reference path: row 1 is the header,
  * every cell surfaces as a STRING column (pandas' dtype sniffing is the
  * caller's `.cast(...)` here — explicit beats inferred for an oracle-
  * checked pipeline). One worksheet per file, the reference's
  * `sheet_name=0` behavior. A workbook is one in-memory ZIP (`binaryFile`
  * caps 2 GB) — inherently a small-file format; big data belongs in
  * parquet, Excel is the ingest edge.
  */
object ExcelIO {

  // ---------------------------------------------------------------- write

  private def xmlEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      (s.charAt(i): @annotation.switch) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        // XML 1.0 forbids these control characters even escaped — raw
        // they make the workbook unparseable by our own reader AND
        // Excel/openpyxl. SpreadsheetML's convention is _xHHHH_ (which
        // requires escaping a literal "_x" as _x005F_x…). '\r' must take
        // this path too ('\t'/'\n' are the only literal-safe controls):
        // XML parsers normalize CR and CRLF in content to LF, so a raw
        // CR would silently read back mutated — Excel itself writes CR
        // as _x000D_ for exactly this reason.
        case c if c < 0x20 && c != '\t' && c != '\n' =>
          sb.append(f"_x${c.toInt}%04X_")
        case '_' if i + 1 < s.length && s.charAt(i + 1) == 'x' =>
          sb.append("_x005F_")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private def colLetters(i0: Int): String = {
    var i = i0
    val sb = new StringBuilder
    while (i >= 0) {
      sb.insert(0, ('A' + i % 26).toChar)
      i = i / 26 - 1
    }
    sb.toString
  }

  private val contentTypesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |</Types>""".stripMargin

  private val relsXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private val workbookXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>""".stripMargin

  private val workbookRelsXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |</Relationships>""".stripMargin

  /** Serialize `rows` (first element of each: already-stringified cells or
    * numerics) into a complete workbook on `out`. Numeric cells (Long/Int/
    * Double/Float/Short/Byte/BigDecimal) become native number cells; nulls
    * become blank cells; everything else an inline string. */
  private def writeWorkbook(out: java.io.OutputStream, header: Array[String],
      rows: Iterator[Row]): Long = {
    val zip = new ZipOutputStream(out)
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(body.getBytes("UTF-8"))
      zip.closeEntry()
    }
    entry("[Content_Types].xml", contentTypesXml)
    entry("_rels/.rels", relsXml)
    entry("xl/workbook.xml", workbookXml)
    entry("xl/_rels/workbook.xml.rels", workbookRelsXml)

    zip.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(zip, "UTF-8"))
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("<worksheet xmlns=\"http://schemas.openxmlformats.org/" +
      "spreadsheetml/2006/main\"><sheetData>")
    var rowNum = 1
    def cellRef(c: Int): String = colLetters(c) + rowNum
    def strCell(c: Int, v: String): Unit =
      w.write(s"""<c r="${cellRef(c)}" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(v)}</t></is></c>""")
    def numCell(c: Int, v: String): Unit =
      w.write(s"""<c r="${cellRef(c)}"><v>$v</v></c>""")
    w.write(s"""<row r="$rowNum">""")
    header.indices.foreach(c => strCell(c, header(c)))
    w.write("</row>")
    var n = 0L
    rows.foreach { r =>
      rowNum += 1
      w.write(s"""<row r="$rowNum">""")
      var c = 0
      while (c < header.length) {
        if (!r.isNullAt(c)) r.get(c) match {
          case x @ (_: Long | _: Int | _: Short | _: Byte) => numCell(c, x.toString)
          // non-finite doubles are invalid SpreadsheetML number cells
          // (<v>NaN</v> marks the workbook corrupt in Excel) — write them
          // as strings; Spark's string→double cast round-trips
          // NaN/Infinity/-Infinity exactly
          case d: Double =>
            if (java.lang.Double.isFinite(d)) numCell(c, d.toString)
            else strCell(c, d.toString)
          case f: Float =>
            if (java.lang.Float.isFinite(f)) numCell(c, f.toString)
            else strCell(c, f.toString)
          case bd: java.math.BigDecimal => numCell(c, bd.toPlainString)
          case b: Boolean =>
            w.write(s"""<c r="${cellRef(c)}" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case v => strCell(c, v.toString)
        }
        c += 1
      }
      w.write("</row>")
      n += 1
    }
    w.write("</sheetData></worksheet>")
    w.flush()
    zip.closeEntry()
    zip.finish()
    n
  }

  /** Write `df` as .xlsx workbooks, one per partition (`part-N.xlsx`),
    * overwriting `path`. Scalar columns only (the Excel cell model). */
  def write(df: DataFrame, path: String): Unit = {
    val header = df.schema.fieldNames
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs0 = p0.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    fs0.delete(p0, true)
    fs0.mkdirs(p0)
    // ship the SESSION conf into the tasks (see graftshim.SerConf): a
    // bare task-side Configuration resolves schemeless paths against the
    // classpath default and drops spark.hadoop.* credentials
    val serConf = new org.apache.spark.sql.graftshim.SerConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty
      else {
        val part = new org.apache.hadoop.fs.Path(s"$path/part-$pid.xlsx")
        val fs = part.getFileSystem(serConf.value)
        val out = fs.create(part, true)
        try Iterator(writeWorkbook(out, header, rows))
        finally out.close()
      }
    }.count(): Unit
    // A fully-empty frame writes no part files (tasks skip empty
    // partitions) — emit one header-only workbook from the driver so the
    // round-trip stays total, like parquet.
    if (!fs0.listStatus(p0).exists(_.getPath.getName.endsWith(".xlsx"))) {
      val out = fs0.create(new org.apache.hadoop.fs.Path(
        s"$path/part-empty.xlsx"), true)
      try writeWorkbook(out, header, Iterator.empty)
      finally out.close()
    }
  }

  // ----------------------------------------------------------------- read

  // a fresh factory per reader: StAX factories are not required to be
  // thread-safe and the JDK implementation reuses internal state — a
  // shared singleton could hand concurrent executor tasks the same
  // reader. Factory construction is noise next to parsing a workbook.
  private def xif: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // untrusted input: no DTDs, no external entities
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f
  }

  /** Pull every ZIP entry we care about into memory (entry order in the
    * archive is arbitrary, so sharedStrings may follow the sheet). */
  private def zipParts(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val wanted = scala.collection.mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      val name = e.getName
      if (name == "xl/sharedStrings.xml" ||
          (name.startsWith("xl/worksheets/") && name.endsWith(".xml")))
        wanted(name) = zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    wanted.toMap
  }

  private def parseSharedStrings(in: InputStream): Array[String] = {
    val r = xif.createXMLStreamReader(in)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => inSi = true; cur.clear()
          case "t" if inSi => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "t" if inSi => inT = false
          case "si" => inSi = false; out += cur.toString
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    out.toArray
  }

  /** A1-style ref → 0-based column index ("C7" → 2); -1 when absent. */
  /** Decode SpreadsheetML's `_xHHHH_` escapes (the writer emits them for
    * XML-illegal control characters, and so does Excel itself) — needed
    * for round-trip fidelity and for external workbooks. */
  private def unescapeX(s: String): String = {
    if (!s.contains("_x")) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (i + 6 < s.length && s.charAt(i) == '_' && s.charAt(i + 1) == 'x' &&
            s.charAt(i + 6) == '_' &&
            (2 to 5).forall(k => Character.digit(s.charAt(i + k), 16) >= 0)) {
          sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
          i += 7
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
  }

  private def refToCol(ref: String): Int = {
    var i = 0; var c = 0; var seen = false
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1; seen = true
    }
    if (seen) c - 1 else -1
  }

  /** Stream one worksheet into rows of string cells. Handles t="s"
    * (sharedStrings), t="inlineStr", t="b", t="str"/"n"/absent. */
  private def parseSheet(in: InputStream, shared: Array[String]): Iterator[Array[String]] = {
    val r = xif.createXMLStreamReader(in)
    val rows = scala.collection.mutable.ArrayBuffer[Array[String]]()
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var cellIdx = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            cells = scala.collection.mutable.ArrayBuffer[String]()
          case "c" if cells != null =>
            val ref = Option(r.getAttributeValue(null, "r"))
            cellIdx = ref.map(refToCol).filter(_ >= 0).getOrElse(cells.length)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            text.clear()
          case "v" => inV = true
          case "t" if cellType == "inlineStr" => inIsT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV || inIsT) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" => inV = false
          case "t" => inIsT = false
          case "c" if cells != null =>
            val raw = text.toString
            val v =
              if (raw.isEmpty && cellType != "inlineStr") null
              else cellType match {
                case "s" => unescapeX(shared(raw.trim.toInt))
                case "b" => if (raw.trim == "1") "true" else "false"
                case "inlineStr" | "str" => unescapeX(raw)
                case _ => raw // "n" | ""
              }
            while (cells.length < cellIdx) cells += null // gap = blank cells
            if (cellIdx == cells.length) cells += v
            else cells(cellIdx) = v
          case "row" =>
            rows += cells.toArray; cells = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows.iterator
  }

  /** header + data rows of the FIRST worksheet of one workbook. */
  private def parseWorkbook(bytes: Array[Byte]): Iterator[Array[String]] = {
    val parts = zipParts(bytes)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(b => parseSharedStrings(new ByteArrayInputStream(b)))
      .getOrElse(Array.empty[String])
    val sheetName = parts.keys.filter(_.startsWith("xl/worksheets/"))
      .toSeq.sorted.headOption.getOrElse(
        throw new IllegalArgumentException("ExcelIO.read: workbook has no worksheet part"))
    parseSheet(new ByteArrayInputStream(parts(sheetName)), shared)
  }

  /** Read a directory of .xlsx workbooks (or a single file) as a DataFrame
    * of STRING columns named by each file's header row. Schema from one
    * driver-side peek; per-file decode runs in executors. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select("content").as[Array[Byte]](Encoders.BINARY)
    val headBytes = files.limit(1).collect().headOption.getOrElse(
      throw new IllegalArgumentException(
        s"ExcelIO.read: no .xlsx workbooks under $path"))
    val header = parseWorkbook(headBytes).buffered.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"ExcelIO.read: first workbook under $path has no header row"))
    // blank header cells in an external workbook gap-fill to null — a
    // null-named StructField fails analysis later; synthesize parquet's
    // positional convention instead
    val st = StructType(header.zipWithIndex.map { case (nm, i) =>
      StructField(if (nm == null || nm.isEmpty) s"_c$i" else nm,
        StringType, nullable = true)
    })
    val n = st.length
    files.mapPartitions { it =>
      it.flatMap { bytes =>
        parseWorkbook(bytes).drop(1).map { cells =>
          val vals = new Array[Any](n)
          var i = 0
          while (i < n) { vals(i) = if (i < cells.length) cells(i) else null; i += 1 }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }
    }(Encoders.row(st))
  }
}
