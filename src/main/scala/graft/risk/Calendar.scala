package graft.risk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Calendar reindex + last-observation-carried-forward, the pure-Spark
 * replacement for the reference's pandas `reindex(method='pad')`
 * (`/root/reference/utils/var_utils.py:7-9`, `05_var_compliance.py:131-132`).
 *
 * Pure-plan throughout: the calendar bounds come from an aggregate subplan
 * cross-joined back (no driver round-trip), the calendar itself is
 * `sequence + explode` (a few KB — broadcastable), and the fill is a
 * windowed `last(ignoreNulls)`, which shuffles once on the series keys.
 */
object Calendar {

  /** One row per day between min and max of `dateCol` in `df` (inclusive),
   * optionally business days (Mon-Fri) only. Output column: `date`. */
  def calendarFor(df: DataFrame, dateCol: String, businessDaysOnly: Boolean = false): DataFrame = {
    val bounds = df.agg(
      to_date(min(col(dateCol))).as("__lo"),
      to_date(max(col(dateCol))).as("__hi"))
    val days = bounds
      .select(explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as("date"))
    if (businessDaysOnly) days.filter(!dayofweek(col("date")).isin(1, 7)) else days
  }

  /**
   * Reindex `df` to a daily calendar per key and forward-fill `valueCols`.
   * Duplicate rows per (keys, day) are first reduced with `max` so the
   * result is deterministic. `dateCol` in the output is a `date`.
   *
   * With `keyCols` empty (one global series) the fill runs through
   * [[Windows.chunkedFfill]] so the plan parallelizes instead of
   * collapsing to a single-task global window; with real keys the keyed
   * window is already parallel and cheaper (one pass, no carry join).
   */
  def reindexFfill(
      df: DataFrame,
      keyCols: Seq[String],
      dateCol: String,
      valueCols: Seq[String],
      businessDaysOnly: Boolean = false): DataFrame = {
    val reduced = df
      .groupBy((keyCols.map(col) :+ to_date(col(dateCol)).as(dateCol)): _*)
      .agg(max(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => max(col(c)).as(c)): _*)

    // keys and calendar bounds derive from `reduced`, NOT from `df`: all
    // consumers then share one identical aggregation subplan, whose
    // shuffle Exchange Spark reuses (ReuseExchange), so an expensive input
    // plan is computed once instead of once per consumer
    val calendar = calendarFor(reduced, dateCol, businessDaysOnly)
      .withColumnRenamed("date", dateCol)
    val grid =
      if (keyCols.isEmpty) calendar
      else calendar.crossJoin(broadcast(reduced.select(keyCols.map(col): _*).distinct()))

    val joined = grid.join(reduced, keyCols :+ dateCol, "left")
    if (keyCols.isEmpty)
      Windows.chunkedFfill(joined, dateCol, Nil, valueCols)
    else {
      val w = Window
        .partitionBy(keyCols.map(col): _*)
        .orderBy(col(dateCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      valueCols.foldLeft(joined) { (d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    }
  }
}
