package graft.sources

import graft.core.{ColumnMap, Ensemble}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Ingestion / persistence surface (reference: Ensemble.from_parquet
  * ensemble.py:1920-2006, from_dask_dataframe :1586-1665, save_ensemble
  * :1315-1430, from_ensemble :1432-1533, ensemble_readers.py).
  *
  * Spark-first notes:
  *  - Parquet column pruning and row-group splitting are automatic; the
  *    reference's `additional_cols=False` becomes a `.select` that Catalyst
  *    pushes into the scan (ReadSchema).
  *  - The reference's `set_index(sorted=...)` (Dask divisions) becomes
  *    `repartitionByRange(id) + sortWithinPartitions(id, time)` — done once
  *    at ingest when `sortLightcurves=true`, after which every
  *    per-lightcurve operator reuses the layout.
  *  - Hive-style partition dirs (the HiPSCat `Norder=/Dir=/Npix=` layout,
  *    ensemble.py:1667-1758) are read natively by Spark's parquet source.
  */
object EnsembleIO {

  /** Read a source (and optionally object) parquet into a new Ensemble.
    * Reference Ensemble.from_parquet, ensemble.py:1920-2006. */
  def fromParquet(
      spark: SparkSession,
      sourceFile: String,
      colMap: ColumnMap,
      objectFile: Option[String] = None,
      additionalCols: Boolean = true,
      sortLightcurves: Boolean = false,
      npartitions: Option[Int] = None,
      syncTables: Boolean = true,
      keepEmptyObjects: Boolean = false
  ): Ensemble = {
    colMap.assertReady()
    var src = spark.read.parquet(sourceFile)
    if (!additionalCols) // prune to the 5 critical roles (ensemble.py:1979-1982)
      src = src.select(colMap.criticalCols.map(col): _*)
    fromDataFrame(spark, src, colMap,
      objectDf = objectFile.map(spark.read.parquet(_)),
      sortLightcurves = sortLightcurves, npartitions = npartitions,
      syncTables = syncTables, keepEmptyObjects = keepEmptyObjects)
  }

  /** Build an Ensemble from existing DataFrames; generates the object table
    * from distinct source ids when absent (reference from_dask_dataframe
    * ensemble.py:1586-1665 + _generate_object_table :2191-2194). */
  def fromDataFrame(
      spark: SparkSession,
      sourceDf: DataFrame,
      colMap: ColumnMap,
      objectDf: Option[DataFrame] = None,
      sortLightcurves: Boolean = false,
      npartitions: Option[Int] = None,
      syncTables: Boolean = true,
      keepEmptyObjects: Boolean = false
  ): Ensemble = {
    colMap.assertReady()
    val ens = new Ensemble(spark, colMap, keepEmptyObjects)
    ens.setSource(sourceDf)
    objectDf match {
      case Some(obj) =>
        ens.setObject(obj)
        if (syncTables) { // loaded object may not align with source
          ens.markDirty(Ensemble.SourceLabel)
          ens.markDirty(Ensemble.ObjectLabel)
          ens.syncTables()
        }
      case None =>
        ens.setObject(sourceDf.select(col(colMap.id)).distinct())
    }
    if (sortLightcurves) ens.sortLightcurves(numPartitions = npartitions)
    else npartitions.foreach(n => ens.repartition(n))
    ens
  }

  /** Build a source table from in-memory columns (reference
    * from_source_dict, ensemble.py:2068-2108). */
  def fromRows(
      spark: SparkSession,
      rows: Seq[org.apache.spark.sql.Row],
      schema: org.apache.spark.sql.types.StructType,
      colMap: ColumnMap
  ): Ensemble =
    fromDataFrame(spark,
      spark.createDataFrame(rows.asJava, schema), colMap)

  /** Write every tracked frame to `<dir>/<label>/` as parquet plus an
    * `ensemble_metadata.json` (reference save_ensemble,
    * ensemble.py:1315-1430). Empty object frames (id-only) are skipped on
    * read, mirroring the reference's 0-column skip. */
  def saveEnsemble(ens: Ensemble, dir: String): Unit = {
    val base = Paths.get(dir)
    Files.createDirectories(base)
    val labels = ens.frameLabels
    // remove stale subdirs from prior saves (ensemble.py:1398-1410)
    if (Files.exists(base)) {
      Files.list(base).iterator().asScala
        .filter(p => Files.isDirectory(p) && !labels.contains(p.getFileName.toString))
        .foreach(deleteRecursively)
    }
    labels.foreach { label =>
      ens.frame(label).write.mode("overwrite").parquet(s"$dir/$label")
    }
    val cm = ens.colMap
    val json =
      s"""{"subdirs": [${labels.map(l => "\"" + l + "\"").mkString(", ")}],
         | "column_mapper": {"id": "${cm.id}", "time": "${cm.time}",
         |  "flux": "${cm.flux}", "err": "${cm.err}", "band": "${cm.band}"}}"""
        .stripMargin
    Files.writeString(base.resolve("ensemble_metadata.json"), json)
  }

  /** Read a saved ensemble layout back (reference from_ensemble,
    * ensemble.py:1432-1533). */
  def fromEnsemble(spark: SparkSession, dir: String): Ensemble = {
    val metaPath = Paths.get(dir, "ensemble_metadata.json")
    val meta = Files.readString(metaPath)
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*\"([^\"]+)\"").r
      m.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalStateException(s"missing $k in $metaPath"))
        .group(1)
    }
    val cm = ColumnMap(field("id"), field("time"), field("flux"),
      field("err"), field("band"))
    val labels = Files.list(Paths.get(dir)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq
    val ens = new Ensemble(spark, cm)
    labels.foreach { l => ens.updateFrame(l, spark.read.parquet(s"$dir/$l")) }
    require(ens.frameLabels.contains(Ensemble.SourceLabel),
      s"saved ensemble at $dir has no source frame")
    if (!ens.frameLabels.contains(Ensemble.ObjectLabel))
      ens.setObject(ens.source.select(col(cm.id)).distinct())
    ens
  }

  /** Persist the ensemble as BUCKETED tables: parquet bucketed (and
    * sorted) by the id column, so reloads get co-located, pre-sorted
    * lightcurves — object↔source joins, sync semi-joins and the batch
    * engine's groupByKey all plan WITHOUT a shuffle (Catalyst recognizes
    * the bucketing as satisfying hash-distribution requirements). This is
    * the persisted form of `sortLightcurves()`: pay the layout cost once
    * at write, every subsequent session skips the exchange. The
    * reference's "known divisions" round-trip bit (save_ensemble's
    * `known_divisions`, ensemble.py:1367) maps to this.
    *
    * Tables are registered as `<prefix>_<label>` in the session catalog
    * (spark.sql.warehouse.dir); read back with [[fromBucketedTables]]. */
  def saveEnsembleBucketed(ens: Ensemble, prefix: String,
      nBuckets: Int = 64): Unit = {
    val cm = ens.colMap
    val spark = ens.spark
    Seq(Ensemble.SourceLabel, Ensemble.ObjectLabel).foreach { label =>
      val tableName = s"${prefix}_$label"
      // clean both the catalog entry and any orphaned location (a crashed
      // prior write can leave the dir without the table)
      spark.sql(s"DROP TABLE IF EXISTS $tableName")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      deleteRecursively(Paths.get(warehouse, tableName.toLowerCase))
      val w = ens.frame(label).write.mode("overwrite")
        .bucketBy(nBuckets, cm.id)
      val sorted =
        if (label == Ensemble.SourceLabel) w.sortBy(cm.id, cm.time)
        else w.sortBy(cm.id)
      sorted.format("parquet").saveAsTable(tableName)
    }
  }

  /** Reload a bucketed ensemble saved by [[saveEnsembleBucketed]]. */
  def fromBucketedTables(spark: SparkSession, prefix: String,
      colMap: ColumnMap, keepEmptyObjects: Boolean = false): Ensemble = {
    val ens = new Ensemble(spark, colMap, keepEmptyObjects)
    ens.setSource(spark.table(s"${prefix}_${Ensemble.SourceLabel}"))
    ens.setObject(spark.table(s"${prefix}_${Ensemble.ObjectLabel}"))
    ens
  }

  /** Read a HiPSCat-style pair of hive-partitioned parquet catalogs
    * (`Norder=/Dir=/Npix=` directory layout) and align sources to objects
    * by the object index (reference from_hipscat/from_lsdb,
    * ensemble.py:1667-1842 — the alignment is
    * `object.join(source, objIdx === srcIdx)` at :1817-1822, then the
    * duplicate-suffixed columns are dropped :1839-1841).
    *
    * Spark reads hive partition dirs natively — partition columns appear
    * as ordinary columns and partition pruning applies; no special catalog
    * machinery is needed.
    *
    * Margin caches (the reference's LSDB path optionally carries a
    * `margin_cache` companion catalog — rows within a small angular
    * margin OUTSIDE each pixel's boundary, ensemble.py:1760-1842
    * context): deliberately NOT modeled. The margin catalog exists to
    * make per-pixel-partition neighbor searches (crossmatch, cone
    * search) correct at pixel borders under Dask's
    * one-partition-per-pixel execution; here the equivalent border
    * correctness comes from [[graft.operators.Crossmatch]]'s own
    * neighbor-cell expansion over the full source table — Catalyst
    * shuffles matching cells together, so no pre-materialized margin
    * rows are needed. Loading a margin catalog AS data would double
    * border rows; point this reader at the primary catalogs only.
    *
    * @param objectIndexCol  column in the object catalog keying objects
    * @param sourceIndexCol  column in the source catalog referencing the
    *                        object index (becomes the ensemble id)
    */
  def fromHipscat(
      spark: SparkSession,
      objectDir: String,
      sourceDir: String,
      colMap: ColumnMap,
      objectIndexCol: String,
      sourceIndexCol: String
  ): Ensemble = {
    val objCat = spark.read.parquet(objectDir)
    val srcCat0 = spark.read.parquet(sourceDir)
    // drop a pre-existing column clashing with the target id name before
    // the rename (the reference drops the suffixed duplicates after its
    // merge, ensemble.py:1839-1841)
    val srcCat =
      if (sourceIndexCol != colMap.id && srcCat0.columns.contains(colMap.id))
        srcCat0.drop(colMap.id)
      else srcCat0
    // re-key sources by the object index; keep one id column
    val srcAligned = srcCat
      .join(objCat.select(col(objectIndexCol).as(sourceIndexCol)),
        Seq(sourceIndexCol), "inner")
      .withColumnRenamed(sourceIndexCol, colMap.id)
    val objKeyed =
      (if (objectIndexCol != colMap.id && objCat.columns.contains(colMap.id))
        objCat.drop(colMap.id)
      else objCat).withColumnRenamed(objectIndexCol, colMap.id)
    fromDataFrame(spark, srcAligned, colMap, objectDf = Some(objKeyed))
  }

  /** Curated-dataset loader backed by a LOCAL JSON registry file (the
    * reference fetches a remote registry, ensemble.py:2008-2066 — this
    * environment is zero-egress, so the registry maps names to local
    * parquet paths: `{"<name>": {"source": "...", "object": "..."}}`). */
  def fromDataset(
      spark: SparkSession,
      registryFile: String,
      name: String,
      colMap: ColumnMap
  ): Ensemble = {
    val meta = Files.readString(Paths.get(registryFile))
    val entry = ("\"" + java.util.regex.Pattern.quote(name) +
      "\"\\s*:\\s*\\{([^}]*)\\}").r
    val body = entry.findFirstMatchIn(meta)
      .getOrElse(throw new IllegalArgumentException(
        s"dataset '$name' not in registry $registryFile"))
      .group(1)
    def field(k: String): Option[String] = {
      val m = ("\"" + k + "\"\\s*:\\s*\"([^\"]+)\"").r
      m.findFirstMatchIn(body).map(_.group(1))
    }
    val src = field("source").getOrElse(throw new IllegalArgumentException(
      s"dataset '$name' missing source path"))
    fromParquet(spark, src, colMap, objectFile = field("object"))
  }

  def availableDatasets(registryFile: String): Seq[String] = {
    val meta = Files.readString(Paths.get(registryFile))
    "\"([^\"]+)\"\\s*:\\s*\\{".r.findAllMatchIn(meta).map(_.group(1)).toSeq
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
