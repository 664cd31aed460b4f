package graft.core

/** Maps dataset column names to the five critical roles of the TAPE data
  * model (reference: src/tape/utils/column_mapper/column_mapper.py:37-51).
  *
  * A light-curve "source" table needs: an object id, an observation time
  * (float MJD), a flux measurement, its error, and a band label. Everything
  * else in the engine is expressed against these roles, so the engine is
  * schema-agnostic beyond this mapping.
  */
final case class ColumnMap(
    id: String,
    time: String,
    flux: String,
    err: String,
    band: String
) {
  /** All five mapped physical column names, in role order. */
  def criticalCols: Seq[String] = Seq(id, time, flux, err, band)

  /** Validation: all roles must be non-empty and distinct
    * (reference column_mapper.py:82-110 `is_ready`). */
  def isReady: Boolean =
    criticalCols.forall(_.nonEmpty) && criticalCols.distinct.size == 5

  def assertReady(): Unit =
    require(isReady, s"ColumnMap is not fully assigned/distinct: $this")

  /** Re-point one role at a new physical column (used by coalesce when it
    * drops a critical input column, reference ensemble_frame.py:1186-1200). */
  def remap(role: String, newCol: String): ColumnMap = role match {
    case "id"   => copy(id = newCol)
    case "time" => copy(time = newCol)
    case "flux" => copy(flux = newCol)
    case "err"  => copy(err = newCol)
    case "band" => copy(band = newCol)
    case other  => throw new IllegalArgumentException(s"unknown role $other")
  }
}

object ColumnMap {
  /** ZTF survey preset (reference column_mapper.py:156-173
    * `ZTFColumnMapper._set_known_map`). With `hipscat=true` (the reference
    * default) the object id is the catalog's `_hipscat_index`; otherwise the
    * cross-matched `ps1_objid`. NOTE: `_hipscat_index` is a uint64 in the
    * catalogs — Spark reads parquet uint64 as signed long, so ids above
    * 2^63−1 wrap negative; range-partitioning/sorting on such ids groups
    * correctly (the mapping is 1:1) but orders differently from the unsigned
    * interpretation (reference ensemble.py:1710-1713 caveat). */
  def ztf(hipscat: Boolean = true): ColumnMap =
    ColumnMap(id = if (hipscat) "_hipscat_index" else "ps1_objid",
      time = "mjd", flux = "mag", err = "magerr", band = "band")

  /** Pan-STARRS1 survey preset (reference column_mapper.py:176-193
    * `PS1ColumnMapper._set_known_map`). Same `_hipscat_index` caveat as ZTF. */
  def ps1(hipscat: Boolean = true): ColumnMap =
    ColumnMap(id = if (hipscat) "_hipscat_index" else "objID",
      time = "obsTime", flux = "apFlux", err = "apFluxErr", band = "filterID")

  /** The reference repo's own PS1-derived *test fixture* schema
    * (tests/tape_tests/data/source/test_source.parquet: ps1_objid int64
    * index, midPointTai/psFlux/psFluxErr float32, filterName string) — not
    * the production PS1 survey map above. */
  val ps1TestFixture: ColumnMap =
    ColumnMap(id = "ps1_objid", time = "midPointTai", flux = "psFlux",
      err = "psFluxErr", band = "filterName")

  /** Preset for the driver-generated `events` table
    * (/root/testdata/sfN/events.parquet): user_id plays the object id, the
    * event timestamp (as fractional epoch-days) the time, `value` the flux. */
  val events: ColumnMap =
    ColumnMap(id = "user_id", time = "ts_days", flux = "value",
      err = "err", band = "event_type")

  /** `ColumnMapper.use_known_map` equivalent (column_mapper.py:60-81):
    * case-insensitive survey name, hipscat id switch (default true). */
  def fromKnownMap(name: String, hipscat: Boolean = true): ColumnMap =
    name.toLowerCase match {
      case "ztf" => ztf(hipscat)
      case "ps1" => ps1(hipscat)
      case other => throw new IllegalArgumentException(s"unknown survey map $other")
    }
}
