package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Gaps-and-islands core: assign a run id per partition that increments
  * exactly where the caller's boundary predicate fires (SQL folklore made
  * first-class; cf. Itzik Ben-Gan's islands formulation). Single-sourced
  * for r38 SCD2 (boundary = value change) and t10 burst debounce
  * (boundary = time gap) so the run semantics cannot drift between them —
  * and property-tested against a driver-side fold on random sequences.
  *
  * Scale: one keyed window (lag + running sum) over the caller's
  * partitioning — no self-join, no driver loop, history length unbounded.
  */
object Islands {
  /** Adds `runCol` to `df`. `boundary(w)` must be true on the FIRST row of
    * each run except possibly the partition's first row (a null-lagged
    * first row always opens run 1 — callers need no null guard).
    */
  def runIds(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
             runCol: String)(boundary: WindowSpec => Column): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols.map(col): _*)
    val isFirst = row_number().over(w) === 1
    df.withColumn("__nb", when(isFirst || boundary(w), 1L).otherwise(0L))
      .withColumn(runCol, sum(col("__nb"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__nb")
  }
}
