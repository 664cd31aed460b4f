package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The STATEFUL line pass of HTML → Markdown conversion, as one native
  * codegen'd expression (`graft.text.HtmlExtract.htmlToMarkdown`'s
  * final stage). The regexp tier is stateless by construction, so the
  * three structures whose rendering needs COUNTERS — ordered-list
  * numbering, nested-list indentation, and GFM pipe tables (whose
  * delimiter row needs the header's column count) — are emitted by the
  * regexps as single-control-character markers at line starts, and
  * this kernel walks the lines once, maintaining the list stack /
  * blockquote depth / table-row accumulator, and emits the finished
  * markdown. One linear scan per row, allocation proportional to the
  * document, zero shuffle — a 100 TB conversion stays map-only with
  * this stage inside WholeStageCodegen (the
  * [[HttpBytesExpressions.CharsetDecodeExpr]] posture).
  *
  * Marker protocol (all below U+0010; the converter strips any
  * pre-existing occurrences from the input before emitting its own,
  * so document text can never forge a marker):
  *
  *   - `U+0001` ul-open, `U+0002` ol-open, `U+0003` list-close —
  *     their own lines; `U+0004` prefixes a list-item line.
  *   - `U+0005` table-open, `U+0006` table-close — their own lines;
  *     `U+0007` prefixes a row line whose cells are separated by
  *     `U+0008` (one per `<td>`/`<th>` start).
  *   - `U+000E` blockquote-open, `U+000F` blockquote-close — their
  *     own lines.
  */
object MdExpressions {

  private final val UlOpen = '\u0001'
  private final val OlOpen = '\u0002'
  private final val ListClose = '\u0003'
  private final val Item = '\u0004'
  private final val TableOpen = '\u0005'
  private final val TableClose = '\u0006'
  private final val RowStart = '\u0007'
  private final val CellSep = '\u0008'
  private final val BqOpen = '\u000E'
  private final val BqClose = '\u000F'

  /** Drop every marker char from a string — applied to continuation
    * text that ends up INSIDE a table cell (a list or table nested in
    * a cell flattens to its text — documented boundary). */
  private def scrub(s: String): String = {
    var has = false
    var i = 0
    while (i < s.length && !has) { if (s.charAt(i) < '\u0010') has = true
      i += 1 }
    if (!has) return s
    val b = new java.lang.StringBuilder(s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '\u0010') b.append(c)
      i += 1
    }
    b.toString
  }

  /** A pipe-table cell: trimmed, inner newlines impossible by
    * construction (cells come from one line), literal pipes escaped
    * `\|` so the GFM reader (and [[graft.text.Markdown]]) round-trips
    * them. */
  private def cleanCell(s: String): String = {
    val t = scrub(s).trim
    if (t.indexOf('|') < 0) t else t.replace("|", "\\|")
  }

  /** The walk. See object doc for the protocol. */
  def restructure(in: UTF8String): UTF8String = {
    val lines = in.toString.split("\n", -1)
    val out = new java.lang.StringBuilder(in.numBytes() + 16)
    // list stack: positive = ol with its counter, -1 = ul
    var stack = new Array[Int](8)
    var depth = 0
    var bq = 0
    var inTable = false
    var rows: scala.collection.mutable.ArrayBuffer[Array[String]] = null
    var lastBlank = true // suppress leading blank lines
    // a blank line inside a blockquote becomes a bare `>` mark so a
    // multi-paragraph quote stays ONE quote — but only BETWEEN quoted
    // content (pending until the next quoted line, so the quote never
    // opens or closes with a stray mark)
    var bqContent = false
    var pendingBqBlank = false

    def flushPendingBq(): Unit = if (pendingBqBlank) {
      if (out.length() > 0) out.append('\n')
      out.append(">" * bq)
      pendingBqBlank = false
      lastBlank = false
    }

    def emit(line: String): Unit = {
      if (line.isEmpty) {
        if (bq > 0) { if (bqContent) pendingBqBlank = true }
        else if (!lastBlank) { out.append('\n'); lastBlank = true }
      } else if (bq > 0) {
        flushPendingBq()
        if (out.length() > 0) out.append('\n')
        out.append("> " * bq).append(line)
        bqContent = true
        lastBlank = false
      } else {
        if (out.length() > 0) out.append('\n')
        out.append(line)
        lastBlank = false
      }
    }
    def paragraphBreak(): Unit = emit("")

    def flushTable(): Unit = {
      if (rows != null && rows.nonEmpty) {
        paragraphBreak()
        val header = rows(0)
        emit(header.mkString("| ", " | ", " |"))
        emit(Seq.fill(header.length)("---").mkString("| ", " | ", " |"))
        var i = 1
        while (i < rows.length) {
          emit(rows(i).mkString("| ", " | ", " |"))
          i += 1
        }
        paragraphBreak()
      }
      rows = null
      inTable = false
    }

    // space/tab/CR-only trim: String.trim strips every char ≤ U+0020,
    // which would eat the protocol markers at line starts
    def wsTrim(s: String): String = {
      var a = 0; var z = s.length
      def ws(c: Char) = c == ' ' || c == '\t' || c == '\r'
      while (a < z && ws(s.charAt(a))) a += 1
      while (z > a && ws(s.charAt(z - 1))) z -= 1
      if (a == 0 && z == s.length) s else s.substring(a, z)
    }

    var li = 0
    while (li < lines.length) {
      val raw = lines(li)
      val line = wsTrim(raw)
      val c0 = if (line.isEmpty) ' ' else line.charAt(0)
      if (inTable && c0 != TableClose && c0 != RowStart &&
          c0 != TableOpen) {
        // text inside the table region: continuation of the current
        // row's LAST cell (a <br> or nested block inside a cell), or
        // pre-row text (a caption) emitted before the table when the
        // table flushes — simplest faithful-order choice: append to
        // the open row; drop free text before the first row (a
        // <caption> flattens away — documented boundary)
        if (line.nonEmpty && rows != null && rows.nonEmpty) {
          val cur = rows(rows.length - 1)
          if (cur.nonEmpty) {
            val t = cleanCell(line)
            if (t.nonEmpty)
              cur(cur.length - 1) =
                (cur(cur.length - 1) + " " + t).trim
          }
        }
      } else c0 match {
        case UlOpen | OlOpen =>
          if (depth == 0) paragraphBreak()
          if (depth == stack.length)
            stack = java.util.Arrays.copyOf(stack, depth * 2)
          stack(depth) = if (c0 == OlOpen) 0 else -1
          depth += 1
        case ListClose =>
          if (depth > 0) depth -= 1
          if (depth == 0) paragraphBreak()
        case Item =>
          val d = math.max(depth, 1)
          val indent = "  " * (d - 1)
          val marker =
            if (depth > 0 && stack(depth - 1) >= 0) {
              stack(depth - 1) += 1
              s"${stack(depth - 1)}. "
            } else "- "
          emit(indent + marker + scrub(line.substring(1)).trim)
        case TableOpen =>
          // nested table-open inside an open table: flush the outer
          // first (no nesting in GFM — documented boundary)
          if (inTable) flushTable()
          inTable = true
          rows = new scala.collection.mutable.ArrayBuffer[Array[String]]
        case TableClose =>
          flushTable()
        case RowStart =>
          if (!inTable) {
            // a stray <tr> outside <table>: treat as a one-row table
            inTable = true
            rows = new scala.collection.mutable.ArrayBuffer[Array[String]]
          }
          val parts = line.substring(1).split(CellSep.toString, -1)
          // parts(0) = text between <tr> and the first cell (markup
          // noise) — dropped; remaining parts are the cells
          if (parts.length > 1)
            rows += parts.iterator.drop(1).map(cleanCell).toArray
        case BqOpen =>
          paragraphBreak()
          // a quote opening INSIDE a quote separates from the outer
          // content at the OUTER depth before deepening
          flushPendingBq()
          bq += 1
          bqContent = false
        case BqClose =>
          if (bq > 0) bq -= 1
          pendingBqBlank = false
          bqContent = bq > 0
          paragraphBreak()
        case _ =>
          // blank lines INSIDE a list are swallowed (tight-list
          // rendering; loose lists are a documented boundary) so a
          // nested-list close can't split its parent's items apart
          if (line.nonEmpty || depth == 0) emit(scrub(line))
      }
      li += 1
    }
    if (inTable) flushTable() // unclosed <table> at EOF
    // trim the trailing blank line the last paragraph break left
    var end = out.length()
    while (end > 0 && (out.charAt(end - 1) == '\n' ||
        out.charAt(end - 1) == ' ')) end -= 1
    UTF8String.fromString(out.substring(0, end))
  }

  case class MdRestructureExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression)
        : Expression = copy(child = c)
    override def nullSafeEval(input: Any): Any =
      restructure(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.MdExpressions.restructure($c)")
    override def prettyName: String = "graft_md_restructure"
  }

  /** Column form of [[restructure]]. */
  def mdRestructure(c: Column): Column =
    column(MdRestructureExpr(expression(c)))
}
