package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (guide: one session per
  * suite, lazy). */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = Spark.session(Some("local[8]"))
  val sf0001 = "/root/testdata/sf0.001"

  /** Reference PS1 golden fixture (FIXTURES.md §1) — read-only. */
  val ps1Source =
    "/root/reference/tests/tape_tests/data/source/test_source.parquet"
  val ps1Object =
    "/root/reference/tests/tape_tests/data/object/test_object.parquet"
}
