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
  /** ZTF survey preset (reference column_mapper.py:156-174). */
  val ztf: ColumnMap =
    ColumnMap(id = "ps1_objid", time = "midPointTai", flux = "psFlux",
      err = "psFluxErr", band = "filterName")

  /** Pan-STARRS1 preset (reference column_mapper.py:176-194). */
  val ps1: ColumnMap =
    ColumnMap(id = "ps1_objid", time = "midPointTai", flux = "psFlux",
      err = "psFluxErr", band = "filterName")

  /** Preset for the driver-generated `events` table
    * (/root/testdata/sfN/events.parquet): user_id plays the object id, the
    * event timestamp (as fractional epoch-days) the time, `value` the flux. */
  val events: ColumnMap =
    ColumnMap(id = "user_id", time = "ts_days", flux = "value",
      err = "err", band = "event_type")

  def fromKnownMap(name: String): ColumnMap = name.toLowerCase match {
    case "ztf" => ztf
    case "ps1" => ps1
    case other => throw new IllegalArgumentException(s"unknown survey map $other")
  }
}
