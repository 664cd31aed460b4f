package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable

/** Session-like container for a light-curve analysis workload: a set of named
  * frames with two special members — the `source` table (one row per
  * photometric observation) and the `object` table (one row per light curve)
  * — kept referentially consistent by a lazy sync protocol.
  *
  * Reference semantics: lincc-frameworks/tape `src/tape/ensemble.py:46`
  * (frames dict :63, source/object :68-69, column mapping :78-82, sync
  * protocol :2215-2292). The Dask client is replaced by the SparkSession;
  * Dask "divisions" bookkeeping is replaced by a single `rangePartitioned`
  * bit (Catalyst tracks output partitioning internally).
  *
  * Mutable by design, mirroring the reference: filters mark a table dirty,
  * and the *other* table is trimmed by a left-semi join the next time it is
  * read (`_lazy_sync_tables`, ensemble.py:2215-2233). At cluster scale the
  * semi-join is shuffle-based unless the id set is small enough for AQE to
  * broadcast — identical to what the reference's index-aligned merge does,
  * but planned by Catalyst.
  */
final class Ensemble(
    val spark: SparkSession,
    var colMap: ColumnMap,
    val keepEmptyObjects: Boolean = false
) {
  import Ensemble._

  private val frames = mutable.LinkedHashMap.empty[String, DataFrame]
  private var sourceDirty = false
  private var objectDirty = false
  /** "Temporary" columns: derived columns a filter invalidates; dropped at
    * the next sync (reference ensemble.py:71-72, 758-767, 2260-2287). */
  private val sourceTemp = mutable.ListBuffer.empty[String]
  private val objectTemp = mutable.ListBuffer.empty[String]
  private var resultCounter = 0

  // ---------------------------------------------------------------- frames

  def frameLabels: Seq[String] = frames.keys.toSeq

  /** Raw frame access without the sync hook (internal + tests). */
  private[graft] def rawFrame(label: String): DataFrame = frames(label)

  /** Tracked-frame read. Reading source/object triggers the lazy sync
    * (reference ensemble.py:2215-2233). */
  def frame(label: String): DataFrame = label match {
    case SourceLabel => source
    case ObjectLabel => objectFrame
    case other       => frames(other)
  }

  def source: DataFrame = { lazySyncTables(SourceLabel); frames(SourceLabel) }
  def objectFrame: DataFrame = { lazySyncTables(ObjectLabel); frames(ObjectLabel) }

  def updateFrame(label: String, df: DataFrame): this.type = {
    frames(label) = df; this
  }

  /** Track a result frame; auto-label `result_N` when unnamed
    * (reference ensemble.py:256-266). */
  def addFrame(df: DataFrame, label: Option[String] = None): String = {
    val name = label.getOrElse {
      while (frames.contains(s"result_$resultCounter")) resultCounter += 1
      s"result_$resultCounter"
    }
    frames(name) = df
    name
  }

  def dropFrame(label: String): this.type = {
    require(label != SourceLabel && label != ObjectLabel,
      s"cannot drop the $label frame")
    frames.remove(label); this
  }

  def setSource(df: DataFrame): this.type = updateFrame(SourceLabel, df)
  def setObject(df: DataFrame): this.type = updateFrame(ObjectLabel, df)

  def markDirty(table: String): this.type = {
    table match {
      case SourceLabel => sourceDirty = true
      case ObjectLabel => objectDirty = true
      case _           => ()
    }
    this
  }

  private[graft] def isDirty(table: String): Boolean = table match {
    case SourceLabel => sourceDirty
    case ObjectLabel => objectDirty
    case _           => false
  }

  // ------------------------------------------------------------------ sync

  /** Sync before reading `table`: reading the source requires object-side
    * filters to be applied to it first, and vice versa
    * (reference _lazy_sync_tables, ensemble.py:2215-2233). */
  private def lazySyncTables(table: String): Unit = table match {
    case SourceLabel if objectDirty => syncTables()
    case ObjectLabel if sourceDirty => syncTables()
    case _                          => ()
  }

  /** Object↔source referential integrity (reference _sync_tables,
    * ensemble.py:2235-2292). Both directions may run in one call — the
    * reference checks the second flag with `if`, not `elif`
    * (ensemble.py:2266). The reference's inner-join-on-index-only-frame is
    * exactly a left-semi join here; no slow `isin` path is needed because
    * Spark plans the shuffle/broadcast itself. */
  def syncTables(): this.type = {
    val idCol = colMap.id
    if (objectDirty) {
      val objIds = frames(ObjectLabel).select(col(idCol))
      frames(SourceLabel) =
        frames(SourceLabel).join(objIds, Seq(idCol), "left_semi")
      dropTempColumns(SourceLabel)
      objectDirty = false
    }
    if (sourceDirty) {
      if (!keepEmptyObjects) {
        val srcIds = frames(SourceLabel).select(col(idCol)).distinct()
        frames(ObjectLabel) =
          frames(ObjectLabel).join(srcIds, Seq(idCol), "left_semi")
      }
      dropTempColumns(ObjectLabel)
      sourceDirty = false
    }
    this
  }

  private def dropTempColumns(table: String): Unit = {
    val temps = if (table == SourceLabel) sourceTemp else objectTemp
    if (temps.nonEmpty) {
      frames(table) = frames(table).drop(temps.toSeq: _*)
      temps.clear()
    }
  }

  private[graft] def registerTemp(table: String, cols: Seq[String]): Unit = {
    val buf = if (table == SourceLabel) sourceTemp else objectTemp
    buf ++= cols.filterNot(buf.contains)
  }

  private[graft] def tempColumns(table: String): Seq[String] =
    (if (table == SourceLabel) sourceTemp else objectTemp).toSeq

  // ---------------------------------------------------- relational surface

  /** Keep only the listed columns (plus the id key, which in the reference
    * survives as the index). Reference ensemble.py:641-661. */
  def select(columns: Seq[String], table: String = SourceLabel): this.type = {
    val df = frame(table)
    val keep = (colMap.id +: columns).distinct.filter(df.columns.contains)
    updateFrame(table, df.select(keep.map(col): _*))
  }

  /** Row filter from a SQL expression string (near superset of the pandas
    * query syntax the reference accepts, incl. backticked names).
    * Reference ensemble.py:663-694; marks the table dirty. */
  def query(expr: String, table: String = SourceLabel): this.type = {
    updateFrame(table, frame(table).filter(expr))
    markDirty(table)
  }

  /** Filter by a boolean Column aligned to the table (reference
    * filter_from_series, ensemble.py:696-715). */
  def filterFrom(cond: Column, table: String = SourceLabel): this.type = {
    updateFrame(table, frame(table).filter(cond))
    markDirty(table)
  }

  /** Drop rows with null/NaN values — pandas `how`/`thresh`/`subset`
    * semantics (reference ensemble.py:614-639). */
  def dropna(
      table: String = SourceLabel,
      how: String = "any",
      thresh: Option[Int] = None,
      subset: Option[Seq[String]] = None
  ): this.type = {
    val df = frame(table)
    val cols = subset.getOrElse(df.columns.toSeq)
    val cleaned = thresh match {
      case Some(t) => df.na.drop(t, cols)
      case None    => df.na.drop(how, cols)
    }
    updateFrame(table, cleaned)
    markDirty(table)
  }

  /** Add computed columns; `temporary=true` registers them for removal at
    * the next sync (reference ensemble.py:717-771). */
  def assign(
      table: String,
      temporary: Boolean,
      columns: (String, Column)*
  ): this.type = {
    val df = columns.foldLeft(frame(table)) { case (d, (name, expr)) =>
      d.withColumn(name, expr)
    }
    if (temporary) registerTemp(table, columns.map(_._1))
    updateFrame(table, df)
  }

  def assign(columns: (String, Column)*): this.type =
    assign(SourceLabel, temporary = false, columns: _*)

  /** General pandas-style merge of another frame into a table (reference
    * _Frame.merge/join, ensemble_frame.py:313-468). Suffix handling
    * renames the right side's clashing non-key columns before the join;
    * Catalyst picks broadcast / shuffled-hash / sort-merge itself — the
    * reference's three dask join strategies collapse into the planner. */
  def merge(
      right: DataFrame,
      on: Seq[String],
      how: String = "inner",
      table: String = SourceLabel,
      rsuffix: String = "_right"
  ): this.type = {
    val left = frame(table)
    val clashing = right.columns.filter(c =>
      left.columns.contains(c) && !on.contains(c))
    val renamed = clashing.foldLeft(right) { (d, c) =>
      d.withColumnRenamed(c, c + rsuffix)
    }
    updateFrame(table, left.join(renamed, on, how))
    markDirty(table)
  }

  /** Append source rows (reference insert_sources, ensemble.py:268-356 —
    * the dd.concat at :342 is a union). */
  def insertSources(rows: DataFrame): this.type = {
    updateFrame(SourceLabel, frame(SourceLabel).unionByName(rows,
      allowMissingColumns = true))
    markDirty(SourceLabel)
  }

  /** Random sample of *objects* as a new Ensemble; sources trimmed lazily by
    * the sync (reference ensemble.py:524-581). */
  def sample(fraction: Double, seed: Long = 42L,
      withReplacement: Boolean = false): Ensemble = {
    val out = new Ensemble(spark, colMap, keepEmptyObjects)
    out.setSource(source)
    out.setObject(objectFrame.sample(withReplacement, fraction, seed))
    out.markDirty(ObjectLabel)
    out
  }

  def head(n: Int, table: String = SourceLabel): Array[org.apache.spark.sql.Row] =
    frame(table).limit(n).collect()

  def tail(n: Int, table: String = SourceLabel): Array[org.apache.spark.sql.Row] =
    frame(table).tail(n)

  /** Materialize a table (sync hook included via `frame`). Reference
    * compute(), ensemble.py:485-510 / ensemble_frame.py:769-771. */
  def compute(table: String = SourceLabel): Array[org.apache.spark.sql.Row] =
    frame(table).collect()

  def persist(table: String = SourceLabel,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): this.type =
    updateFrame(table, frame(table).persist(level))

  def repartition(n: Int, table: String = SourceLabel): this.type =
    updateFrame(table, frame(table).repartition(n))

  /** Establish range partitioning + secondary sort on (id[, band], time) —
    * the reference's lightcurve-cohesion layout (sort_lightcurves,
    * ensemble.py:445-483 + set_index ensemble.py:1640-1643). This is the
    * one explicit shuffle the engine performs; every per-lightcurve op
    * afterwards reuses it. */
  def sortLightcurves(byBand: Boolean = false,
      numPartitions: Option[Int] = None): this.type = {
    val df = source
    val keys =
      if (byBand) Seq(colMap.id, colMap.band, colMap.time)
      else Seq(colMap.id, colMap.time)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, col(colMap.id))
      case None    => df.repartitionByRange(col(colMap.id))
    }
    updateFrame(SourceLabel, ranged.sortWithinPartitions(keys.map(col): _*))
  }

  /** Is the table globally sorted by id IN ITS CURRENT LAYOUT? (reference
    * check_sorted, ensemble.py:395-416 — monotonic index check). The
    * window must order by the physical position, not by the id itself
    * (ordering by id would trivially always pass): monotonically
    * increasing ids encode (partition, row-in-partition), i.e. the
    * stored order. */
  def checkSorted(table: String = SourceLabel): Boolean = {
    import org.apache.spark.sql.expressions.Window
    val idCol = colMap.id
    // Scale-safe layout check: never order the whole table through one
    // task. Each input partition reduces to one row of
    // (pid, min_id, max_id, any_violation_within); sortedness within a
    // partition is checked by a window PARTITIONED by the physical
    // partition id and ordered by monotonically_increasing_id (which
    // encodes row-in-partition position, i.e. the stored order). The
    // cross-partition boundary check then runs driver-side over
    // ~numPartitions rows.
    val perPartition = checkSortedPerPartition(table)
      .collect()
      .sortBy(_.getInt(0))
    val sortedWithin = perPartition.forall(_.getInt(3) == 0)
    val boundariesOk = perPartition.iterator.sliding(2).withPartial(false)
      .forall { case Seq(a, b) => compareIds(a.get(2), b.get(1)) <= 0 }
    sortedWithin && boundariesOk
  }

  /** The distributed half of [[checkSorted]], exposed so specs can assert
    * the plan contains no partition-less (single-task) Window. */
  private[graft] def checkSortedPerPartition(table: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val idCol = colMap.id
    val w = Window.partitionBy(col("__pid")).orderBy(col("__ord"))
    frame(table)
      .select(col(idCol).as("__id"), spark_partition_id().as("__pid"),
        monotonically_increasing_id().as("__ord"))
      .withColumn("__prev", lag(col("__id"), 1).over(w))
      .groupBy(col("__pid"))
      .agg(
        min(col("__id")).as("__min"),
        max(col("__id")).as("__max"),
        max(when(col("__prev") > col("__id"), 1).otherwise(0)).as("__viol"))
  }

  /** Driver-side ordering for the handful of partition-boundary id values in
    * `checkSorted`; ids are primitives or strings, all `Comparable`. */
  private def compareIds(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: Comparable[_], y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
    case _ => throw new IllegalArgumentException(
      s"id type ${a.getClass} is not orderable")
  }

  /** Does any light curve span more than one partition? (reference
    * check_lightcurve_cohesion, ensemble.py:418-443). */
  def checkLightcurveCohesion(): Boolean = {
    source
      .withColumn("__pid", spark_partition_id())
      .groupBy(col(colMap.id))
      .agg(countDistinct(col("__pid")).as("__nparts"))
      .filter(col("__nparts") > 1)
      .isEmpty
  }

  // ------------------------------------------------------------- overview

  def columns(table: String = SourceLabel): Seq[String] =
    frames(table).columns.toSeq

  /** The i-th physical partition of a table as a DataFrame (reference
    * `EnsembleFrame.partitions[i]`, ensemble_frame.py:159-179). Planned as
    * a `spark_partition_id()` filter — no shuffle, no RDD round-trip, and
    * the predicate stays inside whole-stage codegen; non-selected
    * partitions emit nothing. */
  def partitions(i: Int, table: String = SourceLabel): DataFrame = {
    val df = frame(table)
    val n = df.rdd.getNumPartitions
    require(i >= 0 && i < n,
      s"partition index $i out of range for $n partitions")
    df.filter(spark_partition_id() === i)
  }

  /** Per-frame summary: schema always; row count + partition count (the
    * size proxy — Dask's memory_usage has no lazy Spark analogue) only
    * when `countRows` is set (reference frame_info, ensemble.py:221-254).
    * Raises on an unknown label, like the reference. `countRows` defaults
    * OFF: the reference's info is cheap by default, and both a row count
    * AND a partition count are jobs here (the latter because `.rdd` on an
    * AQE plan materializes its shuffle stages) — with the default, the
    * call is schema-only and runs zero Spark jobs. */
  def frameInfo(labels: Seq[String] = Seq.empty,
      countRows: Boolean = false): String = {
    val want = if (labels.isEmpty) frames.keys.toSeq else labels
    want.map { label =>
      if (!frames.contains(label))
        throw new NoSuchElementException(
          s"Unable to get frame info: no frame with label '$label' is in the Ensemble.")
      val df = frames(label)
      val exec =
        if (countRows)
          s"rows: ${df.count()}\npartitions: ${df.rdd.getNumPartitions}\n"
        else ""
      s"$label Frame\n${df.schema.treeString}$exec"
    }.mkString("\n")
  }

  /** Source+object summary, syncing both first (reference info,
    * ensemble.py:358-393). Row counts only on request, as in frameInfo. */
  def info(countRows: Boolean = false): String = {
    syncTables()
    frameInfo(Seq(ObjectLabel, SourceLabel), countRows)
  }

  /** Numeric column statistics (count/mean/stddev/min/max) for a table —
    * the pandas `describe` users reach for right after `info`. Planned as
    * one distributed aggregate by Spark's built-in summarizer. */
  def describe(table: String = SourceLabel): DataFrame =
    frame(table).describe()

  override def toString: String = {
    val fr = frames.map { case (k, v) => s"$k(${v.columns.length} cols)" }
    s"Ensemble(${fr.mkString(", ")}, dirty=[src=$sourceDirty,obj=$objectDirty])"
  }
}

object Ensemble {
  val SourceLabel = "source"
  val ObjectLabel = "object"
}
