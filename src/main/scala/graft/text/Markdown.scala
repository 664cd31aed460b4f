package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Markdown structure extraction for document corpora.
  *
  * Tables are the densest structured data in web/markdown text, and
  * table-aware training sets (table-to-text, structure extraction,
  * data-grounded QA) start by lifting them out of prose. This op
  * handles the GitHub-flavored pipe-table form with or WITHOUT outer
  * pipes (`| a | b |` and GFM's equally-legal `a | b`), recognized by
  * the delimiter line (`:?-+:?` cells, at least one pipe) under the
  * header, PLUS GFM's single-column pipe-less form (pipe-free header,
  * one-cell delimiter carrying the disambiguating pipe — `|---`,
  * `---|` or `| --- |` — and pipe-free body rows up to a blank line).
  * `\|` escapes a literal pipe inside a cell (GFM): escaped pipes
  * never split, and cells carry the UNESCAPED character. Documented
  * boundaries, not silent wrong answers: in the multi-column form a
  * body line containing NO unescaped pipe terminates the block (GFM
  * would keep it as a one-cell row), and in the single-column form a
  * body line containing a pipe terminates it (GFM would truncate it
  * to its first cell); header/delimiter cell counts are not
  * cross-checked.
  *
  * Scale: the whole extraction is regexp + three posexplodes — rows =
  * total cells, no shuffle, no window, no per-doc state. A 100 TB
  * markdown lane is scan → explode → downstream aggregate.
  */
object Markdown {

  /** One GitHub pipe table: header line (any line with a pipe),
    * delimiter line (each column `:?-+:?`, pipes between — with or
    * without the outer pair, but at least ONE pipe, so a thematic
    * break `---` or a blank line can never read as a delimiter; its
    * trailing newline is optional so a zero-body table may end the
    * document), then zero or more body rows (lines with a pipe).
    * A second top-level alternative recognizes GFM's single-column
    * pipe-less form: a pipe-free header over a ONE-cell delimiter
    * that carries the disambiguating pipe itself (`|---`, `---|`,
    * `| --- |` — without one the line would be a thematic break /
    * setext underline), then pipe-free non-blank body rows.
    * Multiline RE2, single outer capture group. */
  private[graft] val TableRe: String = {
    val cell = ":?-+:?"
    val s = "[ \\t]*"
    // delimiter with a leading pipe (trailing optional) …
    val dLead = "(?:\\|" + s + cell + s + ")+\\|?"
    // … or without one: first cell, then ≥1 pipe-separated cells
    // (trailing pipe-only form `--- |` included via the optional tail)
    val dBare = cell + s + "\\|(?:" + s + cell + s + "\\|)*" +
      "(?:" + s + cell + ")?"
    // single-column delimiter: leading pipe (trailing optional) or
    // trailing pipe only — exactly one cell either way
    val dSolo = "(?:\\|" + s + cell + s + "\\|?|" + cell + s + "\\|)"
    // a solo body row: non-blank (≥1 non-space char), pipe-free, and
    // anchored to line end (`$` under (?m), RE2-portable — without it
    // a line with a pipe would HALF-match up to the pipe instead of
    // terminating the table)
    val soloRow = s + "[^ \\t\\n|][^\\n|]*$"
    "(?m)(^[^\\n]*\\|[^\\n]*\\n" +
      s + "(?:" + dLead + "|" + dBare + ")" + s + "\\n?" +
      "(?:[^\\n]*\\|[^\\n]*\\n?)*" +
      "|^[^\\n|]+\\n" +
      s + dSolo + s + "\\n?" +
      "(?:" + soloRow + "\\n?)*)"
  }

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
    // GFM strips one optional leading and trailing pipe per row; split
    // leaves an empty element on each stripped side, sliced off here
    // (interior empty cells survive). `\|` escapes a literal pipe: it
    // sentinel-swaps before the structural split so it can never
    // split, and restores UNESCAPED in the cell value.
    val rowT = regexp_replace(trim(col("__mt_line")),
      "\\\\\\|", "\u0001")
    val rawCells = split(rowT, "\\|", -1)
    val noLead = when(rowT.startsWith("|"),
      slice(rawCells, lit(2), size(rawCells) - 1)).otherwise(rawCells)
    val cells = when(rowT.endsWith("|"),
      slice(noLead, lit(1), size(noLead) - 1)).otherwise(noLead)
    docs
      .select(col("*"), posexplode(tables).as(Seq("table_idx", "__mt_tbl")))
      .select(col("*"), posexplode(lines).as(Seq("row_idx", "__mt_line")))
      .select(col("*"), posexplode(cells).as(Seq("col_idx", "__mt_cell")))
      .withColumn("cell",
        regexp_replace(trim(col("__mt_cell")), "\u0001", "|"))
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

  /** Body rows LINEARIZED as `Header: value | Header: value` strings —
    * the table-to-text serialization table-grounded training sets
    * (ToTTo/TaPas-style pretraining, RAG table chunks) feed an LM:
    * (…, table_idx, row_idx [1-based body rows], linearized). Cells
    * pair with their header by column position; a body cell past the
    * header's width gets an empty header label (`: v`) rather than
    * dropping — GFM ignores such cells, a linearizer must not lose
    * data silently. Zero-body tables emit nothing.
    *
    * Scale: one (id, table, col) broadcast-shaped join against the
    * header cells (headers ≤ one row per table — a small dimension by
    * construction) and one (id, table, row) aggregate; both map-side
    * combinable, nothing corpus-sized collected. */
  def markdownTableLinearize(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val cells = markdownTableCells(docs, textCol)
    val header = cells.filter(col("row_idx") === 0)
      .select(col(idCol), col("table_idx"), col("col_idx"),
        col("cell").as("__hdr"))
    cells.filter(col("row_idx") > 0)
      .join(header, Seq(idCol, "table_idx", "col_idx"), "left")
      .groupBy(col(idCol), col("table_idx"), col("row_idx"))
      .agg(concat_ws(" | ", sort_array(collect_list(
        struct(col("col_idx"),
          concat(coalesce(col("__hdr"), lit("")), lit(": "),
            col("cell")).as("kv"))))
        .getField("kv")).as("linearized"))
  }
}
