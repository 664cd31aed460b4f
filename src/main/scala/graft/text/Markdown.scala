package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markdown structure extraction for document corpora.
  *
  * Tables are the densest structured data in web/markdown text, and
  * table-aware training sets (table-to-text, structure extraction,
  * data-grounded QA) start by lifting them out of prose. This op
  * handles the GitHub-flavored pipe-table form with OUTER PIPES on
  * every row (`| a | b |` header, `|---|:--:|` delimiter, body rows) —
  * the dominant shape in rendered READMEs and wiki dumps. Tables
  * without outer pipes and `\|` cell escapes are a documented
  * boundary, not a silent wrong answer: such lines simply terminate or
  * never start a block.
  *
  * Scale: the whole extraction is regexp + three posexplodes — rows =
  * total cells, no shuffle, no window, no per-doc state. A 100 TB
  * markdown lane is scan → explode → downstream aggregate.
  */
object Markdown {

  /** One GitHub pipe table: header line, delimiter line (each column
    * `:?-+:?`, so a blank body row can never read as a delimiter),
    * then zero or more body rows. Multiline RE2, single outer capture
    * group. */
  private[graft] val TableRe: String =
    "(?m)(^\\|[^\\n]*\\|[ \\t]*\\n" +
      "\\|(?:[ \\t]*:?-+:?[ \\t]*\\|)+[ \\t]*\\n" +
      "(?:\\|[^\\n]*\\|[ \\t]*\\n?)*)"

  /** One row per CELL of every pipe table in `textCol`: input columns
    * (minus `textCol`) plus table_idx [0-based, document order],
    * row_idx [0 = header; body rows from 1 — the delimiter line is
    * dropped], col_idx [0-based], cell [trimmed]. Alignment markers in
    * the delimiter line are structural, not data, so they never
    * appear. */
  def markdownTableCells(docs: DataFrame, textCol: String): DataFrame = {
    val tables = regexp_extract_all(col(textCol), lit(TableRe), lit(1))
    // lines minus blanks, minus the delimiter (index 1 of each block)
    val lines = filter(
      filter(split(col("__mt_tbl"), "\n"), l => trim(l) =!= ""),
      (_, i) => i =!= 1)
    val rawCells = split(col("__mt_line"), "\\|", -1)
    // split keeps the empties before the first and after the last
    // outer pipe: slice them off, keep interior cells (empty included)
    val cells = slice(rawCells, lit(2), size(rawCells) - lit(2))
    docs
      .select(col("*"), posexplode(tables).as(Seq("table_idx", "__mt_tbl")))
      .select(col("*"), posexplode(lines).as(Seq("row_idx", "__mt_line")))
      .select(col("*"), posexplode(cells).as(Seq("col_idx", "__mt_cell")))
      .withColumn("cell", trim(col("__mt_cell")))
      .drop("__mt_tbl", "__mt_line", "__mt_cell", textCol)
  }

  /** Table-level summary built on [[markdownTableCells]]: (…, table_idx,
    * n_rows [header included], n_cols [of the header], header
    * [comma-joined]). One aggregate keyed by the exploded table — the
    * only shuffle in the markdown lane, map-side combinable. */
  def markdownTableStats(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val cellsDf = markdownTableCells(docs, textCol)
    cellsDf
      .groupBy(col(idCol), col("table_idx"))
      .agg(
        (max(col("row_idx")) + 1).as("n_rows"),
        (max(when(col("row_idx") === 0, col("col_idx")))
          .cast("int") + 1).as("n_cols"),
        concat_ws(",", sort_array(collect_list(
          when(col("row_idx") === 0,
            struct(col("col_idx"), col("cell")))))
          .getField("cell")).as("header"))
  }
}
