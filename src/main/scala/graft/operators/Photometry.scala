package graft.operators

import graft.core.Ensemble
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived-column and aggregation operators over the Ensemble
  * (reference SURVEY.md §2.2/§2.4): per-object observation counts, pruning,
  * time binning, flux→magnitude conversion, column coalescing, day-gap
  * histogram.
  *
  * All operators are single-code-path declarative plans — the reference's
  * `use_map` / known-divisions dual paths collapse because Catalyst already
  * does partial (map-side) aggregation and exchange reuse.
  */
object Photometry {

  implicit class PhotometryOps(private val ens: Ensemble) extends AnyVal {
    import Ensemble.{ObjectLabel, SourceLabel}

    /** Per-object observation counts joined onto the object table.
      * `byBand=true` adds one `nobs_<band>` column per observed band plus
      * `nobs_total` (reference calc_nobs, ensemble.py:773-870 — the
      * known-divisions pivot fast path and the global value_counts path
      * collapse to one groupBy/pivot plan here).
      *
      * Scale: one shuffle on id with map-side partial counts; the band
      * pivot is computed in the same aggregate (no extra pass). The
      * distinct-bands collect is a tiny driver-side action (bands are
      * low-cardinality by construction). */
    def calcNobs(byBand: Boolean = false, temporary: Boolean = true): Ensemble = {
      val cm = ens.colMap
      val src = ens.source
      val counts: DataFrame = if (byBand) {
        val bands = src.select(col(cm.band).cast("string")).distinct()
          .collect().map(_.getString(0)).sorted
        val pivoted = src.groupBy(col(cm.id))
          .pivot(col(cm.band).cast("string"), bands.toSeq)
          .count().na.fill(0L, bands)
        val renamed = bands.foldLeft(pivoted) { (d, b) =>
          d.withColumnRenamed(b, s"nobs_$b")
        }
        renamed.withColumn("nobs_total",
          bands.map(b => col(s"nobs_$b")).reduce(_ + _))
      } else {
        src.groupBy(col(cm.id)).agg(count(lit(1)).as("nobs_total"))
      }
      val newCols = counts.columns.filterNot(_ == cm.id).toSeq
      val preExisting = ens.objectFrame.columns.toSet
      val obj = ens.objectFrame.drop(newCols: _*)
        .join(counts, Seq(cm.id), "left")
      ens.updateFrame(ObjectLabel, obj)
      // Only columns that did NOT already exist are registered temporary
      // (the reference's assign() rule, ensemble.py:758-760): overwriting
      // a persistent column (e.g. a loaded object table's own nobs_total)
      // must not schedule it for removal at the next sync.
      if (temporary)
        ens.registerTemp(ObjectLabel, newCols.filterNot(preExisting))
      ens
    }

    /** Drop objects with fewer than `threshold` observations (reference
      * prune, ensemble.py:872-904). With no `colName`, the counts are
      * ALWAYS recomputed (reference `if not col_name: calc_nobs()`), so a
      * stale pre-filter nobs column is never used; an explicit `colName`
      * must already exist on the object table. Marks the object table
      * dirty so sources of pruned objects are trimmed at the next source
      * read. */
    def prune(threshold: Int, colName: Option[String] = None): Ensemble = {
      val c = colName match {
        case Some(name) =>
          require(ens.objectFrame.columns.contains(name),
            s"prune column '$name' not present on the object table")
          name
        case None =>
          calcNobs(byBand = false, temporary = true)
          "nobs_total"
      }
      ens.updateFrame(ObjectLabel,
        ens.objectFrame.filter(col(c) >= lit(threshold)))
      ens.markDirty(ObjectLabel)
      ens
    }

    /** Bin sources in time per (id, band): flux/time → mean, err →
      * sqrt(Σerr²)/count (only when the err column is present), optional
      * per-bin count column, per-column agg overrides (reference
      * bin_sources, ensemble.py:956-1052 — the custom Dask partial/final
      * aggregation collapses to composed built-in expressions, which
      * Catalyst evaluates with map-side partials). Only aggregated columns
      * survive, like the reference's aggr_funs dict — extra columns are
      * dropped.
      *
      * The aggregation list is an insertion-ordered Seq mirroring the
      * reference dict order — time, flux, err, count, then custom
      * overrides/appends — so the output column order is deterministic for
      * any number of custom aggs. A pre-existing count column is SUMMED
      * (re-binning already-binned data accumulates observation counts,
      * ensemble.py:1027-1031), not recounted. */
    def binSources(
        timeWindow: Double = 1.0,
        offset: Double = 0.0,
        countCol: Option[String] = None,
        customAggr: Iterable[(String, Column)] = Nil
    ): Ensemble = {
      val cm = ens.colMap
      val src = ens.source
      val bin = (floor((col(cm.time) + lit(offset)) / lit(timeWindow)) *
        lit(timeWindow)).as("__tmp_time_bin")
      var aggs: Vector[(String, Column)] = Vector(
        cm.time -> avg(col(cm.time)).as(cm.time),
        cm.flux -> avg(col(cm.flux)).as(cm.flux))
      if (src.columns.contains(cm.err))
        // count(err)=0 (all-null err in a bin) must yield NULL, not an
        // ANSI divide-by-zero job abort
        aggs :+= cm.err -> when(count(col(cm.err)) > 0,
          sqrt(sum(col(cm.err) * col(cm.err))) / count(col(cm.err)))
          .as(cm.err)
      countCol.foreach { c =>
        val agg =
          if (src.columns.contains(c)) sum(col(c)).as(c)
          else count(lit(1)).as(c)
        aggs :+= c -> agg
      }
      customAggr.foreach { case (k, v) =>
        val i = aggs.indexWhere(_._1 == k)
        if (i >= 0) aggs = aggs.updated(i, k -> v.as(k))
        else aggs :+= k -> v.as(k)
      }
      val exprs = aggs.map(_._2)
      val binned = src
        .groupBy(col(cm.id), col(cm.band), bin)
        .agg(exprs.head, exprs.tail: _*)
        .drop("__tmp_time_bin")
      ens.updateFrame(SourceLabel, binned)
      ens.markDirty(SourceLabel)
      ens
    }

    /** Convert flux to AB-style magnitude with error propagation
      * (reference convert_flux_to_mag, ensemble.py:2110-2189):
      * zp expressed as a flux: mag = -2.5·log10(flux/zp);
      * zp expressed as a mag:  mag = -2.5·log10(flux) + zp;
      * err_mag = (2.5/ln 10)·(err/flux). `zeroPoint` may be a column name
      * or a literal. Pure `functions._` — fully codegen'd.
      *
      * Non-positive flux yields NULL mag/err (Spark's own non-ANSI
      * `log10(0)` convention) rather than numpy's ±inf — the explicit
      * guard keeps the operator well-defined under ANSI mode, where a
      * single flux=0 row would otherwise abort the whole job with
      * DIVIDE_BY_ZERO / log-of-zero errors. */
    def convertFluxToMag(
        zeroPoint: Either[String, Double],
        zpForm: String = "mag",
        outColName: Option[String] = None
    ): Ensemble = {
      val cm = ens.colMap
      val zp: Column = zeroPoint match {
        case Left(name) => col(name)
        case Right(v)   => lit(v)
      }
      val magCol = outColName.getOrElse(cm.flux + "_mag")
      val magErrCol = magCol + "_err" // reference: out_col_name + "_err"
      val positive = col(cm.flux) > 0
      val mag = zpForm match {
        case "flux" => // zp is a divisor here — a zero zp row must NULL out
          when(positive && zp =!= 0, lit(-2.5) * log10(col(cm.flux) / zp))
        case "mag" | "magnitude" =>
          when(positive, lit(-2.5) * log10(col(cm.flux)) + zp)
        case other =>
          throw new IllegalArgumentException(
            s"$other is not a valid zero_point format.")
      }
      val magErr = when(positive,
        (lit(2.5) / log(lit(10.0))) * (col(cm.err) / col(cm.flux)))
      ens.updateFrame(SourceLabel,
        ens.source.withColumn(magCol, mag).withColumn(magErrCol, magErr))
      ens
    }

    /** First non-NaN/non-null value across columns (reference
      * EnsembleFrame.coalesce, ensemble_frame.py:1136-1208). NaN is
      * normalized to null first so SQL COALESCE skips it. If a dropped
      * input was a critical column, the ColumnMap is re-pointed at the
      * output (ensemble_frame.py:1186-1200). */
    def coalesceCols(
        inputCols: Seq[String],
        outputCol: String,
        table: String = SourceLabel,
        dropInputs: Boolean = false
    ): Ensemble = {
      val df = ens.frame(table)
      val isFloating = inputCols.forall { c =>
        df.schema(c).dataType match {
          case org.apache.spark.sql.types.DoubleType |
              org.apache.spark.sql.types.FloatType => true
          case _ => false
        }
      }
      val normalized = inputCols.map { c =>
        if (isFloating) when(isnan(col(c)), lit(null)).otherwise(col(c))
        else col(c)
      }
      var out = df.withColumn(outputCol, coalesce(normalized: _*))
      if (dropInputs) {
        out = out.drop(inputCols.filterNot(_ == outputCol): _*)
        val cm = ens.colMap
        Seq("id" -> cm.id, "time" -> cm.time, "flux" -> cm.flux,
          "err" -> cm.err, "band" -> cm.band).foreach { case (role, c) =>
          if (inputCols.contains(c) && c != outputCol)
            ens.colMap = ens.colMap.remap(role, outputCol)
        }
      }
      ens.updateFrame(table, out)
      ens
    }

    /** Histogram of hour-of-day source counts; returns the midpoint (in
      * days) of the longest empty wrapping run, or None if every hour is
      * populated (reference find_day_gap_offset, ensemble.py:906-954).
      * One tiny 24-bin aggregate; the scan is the only cost. */
    def findDayGapOffset(): Option[Double] = {
      val cm = ens.colMap
      val counts = ens.source
        .groupBy(pmod(floor(col(cm.time) * 24), lit(24)).cast("int").as("hour"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val occupied = (0 until 24).map(h => counts.getOrElse(h, 0L) > 0L)
      if (occupied.forall(identity)) return None
      // longest empty run over the wrapped 24-hour cycle
      val doubled = occupied ++ occupied
      var bestLen = 0; var bestStart = 0
      var curLen = 0; var curStart = 0
      doubled.indices.foreach { i =>
        if (!doubled(i)) {
          if (curLen == 0) curStart = i
          curLen += 1
          if (curLen > bestLen && curStart < 24) {
            bestLen = math.min(curLen, 24); bestStart = curStart
          }
        } else curLen = 0
      }
      val mid = (bestStart + bestLen / 2.0) % 24
      Some(mid / 24.0)
    }
  }
}
