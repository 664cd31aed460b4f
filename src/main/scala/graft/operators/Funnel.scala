package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream: how many entities
  * complete each step of a named sequence, where step i+1 counts only
  * events STRICTLY AFTER the entity's step-i conversion time and within
  * `window` time units of it. Conversion time per step is the EARLIEST
  * qualifying event (the standard first-touch funnel).
  *
  * Scale design: each step is one equi-join on the entity key against
  * the (already converted) previous step followed by a min-aggregate —
  * never a per-entity window over the full stream, never a driver-side
  * loop over entities. The per-step conversion frames are one narrow row
  * per converted entity and are barriered with an eager localCheckpoint
  * so the k-step chain costs k linear passes, not a 2^k plan blow-up
  * (each frame feeds both its successor and its own count). */
object Funnel {

  /** One row per step: (step 1-based, step_name, n_entities, with
    * n_entities monotonically non-increasing down the funnel). */
  def funnel(events: DataFrame, idCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], window: Double): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(window > 0, s"window must be positive, got $window")
    def barrier(df: DataFrame): DataFrame =
      if (df.isStreaming) df else df.localCheckpoint(true)
    var cur = barrier(events.filter(col(typeCol) === steps.head)
      .groupBy(col(idCol).as("__id"))
      .agg(min(col(tsCol)).as("__t")))
    val counts = scala.collection.mutable.ArrayBuffer(
      cur.agg(count(lit(1)).as("n_entities"))
        .select(lit(1).as("step"), lit(steps.head).as("step_name"),
          col("n_entities")))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = cur.select(col("__id"), col("__t").as("__pt"))
      cur = barrier(events.filter(col(typeCol) === step)
        .select(col(idCol).as("__id"), col(tsCol).as("__t"))
        .join(prev, "__id")
        .filter(col("__t") > col("__pt") &&
          col("__t") <= col("__pt") + lit(window))
        .groupBy(col("__id"))
        .agg(min(col("__t")).as("__t")))
      counts += cur.agg(count(lit(1)).as("n_entities"))
        .select(lit(i + 1).as("step"), lit(step).as("step_name"),
          col("n_entities"))
    }
    counts.reduce(_.union(_))
  }
}
