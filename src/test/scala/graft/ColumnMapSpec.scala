package graft

import graft.core.ColumnMap
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference ColumnMapper assertions
  * (/root/reference/tests/tape_tests/test_utils.py:23-91) onto ColumnMap. */
class ColumnMapSpec extends AnyFunSuite {

  test("explicit assignment yields a ready map (test_utils.py:54-77)") {
    val m = ColumnMap(id = "id", time = "time", flux = "flux",
      err = "err", band = "band")
    assert(m.isReady)
    assert(m.criticalCols == Seq("id", "time", "flux", "err", "band"))
  }

  test("empty or duplicate roles are not ready (test_utils.py:23-41)") {
    assert(!ColumnMap("", "time", "flux", "err", "band").isReady)
    assert(!ColumnMap("id", "time", "flux", "flux", "band").isReady)
    intercept[IllegalArgumentException] {
      ColumnMap("", "", "", "", "").assertReady()
    }
  }

  test("ZTF known map, hipscat and not (column_mapper.py:156-173)") {
    val hips = ColumnMap.ztf()
    assert(hips == ColumnMap("_hipscat_index", "mjd", "mag", "magerr", "band"))
    val plain = ColumnMap.ztf(hipscat = false)
    assert(plain == ColumnMap("ps1_objid", "mjd", "mag", "magerr", "band"))
    assert(hips.isReady && plain.isReady)
  }

  test("PS1 known map, hipscat and not (column_mapper.py:176-193)") {
    val hips = ColumnMap.ps1()
    assert(hips == ColumnMap("_hipscat_index", "obsTime", "apFlux", "apFluxErr", "filterID"))
    val plain = ColumnMap.ps1(hipscat = false)
    assert(plain == ColumnMap("objID", "obsTime", "apFlux", "apFluxErr", "filterID"))
    assert(hips.isReady && plain.isReady)
  }

  test("use_known_map is case-insensitive; unknown raises (test_utils.py:80-91)") {
    assert(ColumnMap.fromKnownMap("ztf") == ColumnMap.ztf())
    assert(ColumnMap.fromKnownMap("ZTF", hipscat = false) == ColumnMap.ztf(false))
    assert(ColumnMap.fromKnownMap("Ps1") == ColumnMap.ps1())
    intercept[IllegalArgumentException] { ColumnMap.fromKnownMap("Grundor") }
  }

  test("remap re-points a single role") {
    val m = ColumnMap.ps1TestFixture.remap("flux", "psMag")
    assert(m.flux == "psMag" && m.id == "ps1_objid")
    intercept[IllegalArgumentException] {
      ColumnMap.ps1TestFixture.remap("nope", "x")
    }
  }
}
