package graft.risk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-path window shapes.
 *
 * An unpartitioned trailing range window (`Window.orderBy(ts)
 * .rangeBetween(-N·day, 0)`) is the idiomatic Spark spelling for "trailing
 * N days over one global series" — and it collapses the whole series into
 * ONE task (SURVEY §4 pitfall 1). Fine at thousands of rows; fatal at
 * billions.
 */
object Windows {

  /**
   * Trailing range-window aggregates over a single global time series,
   * parallelized by time-chunking: every row is replicated into its home
   * chunk and the next one (as look-back context), the window runs inside
   * each chunk partition, and only home-chunk rows are kept. Because
   * `chunkDays ≥ windowDays`, each row still sees its complete trailing
   * window; the plan becomes shuffle-on-chunk + parallel windows instead
   * of a global single-task sort. Results are identical to the
   * unpartitioned spelling.
   *
   * `aggs` are window aggregate expressions, e.g.
   * `("rolling_sum", sum(col("x")))`.
   */
  def chunkedTrailingRange(
      df: DataFrame,
      dateCol: String,
      windowDays: Int,
      chunkDays: Int,
      aggs: (String, Column)*): DataFrame = {
    require(chunkDays >= windowDays,
      s"chunkDays ($chunkDays) must cover the lookback ($windowDays)")
    val chunkLen = chunkDays.toLong * 86400L
    val w = Window
      .partitionBy(col("__chunk"))
      .orderBy(col(dateCol).cast("long"))
      .rangeBetween(-windowDays.toLong * 86400L, 0L)
    val base = df
      .withColumn("__home", floor(col(dateCol).cast("long") / chunkLen))
      .withColumn("__chunk", explode(array(col("__home"), col("__home") + 1)))
    aggs.foldLeft(base) { case (d, (name, a)) => d.withColumn(name, a.over(w)) }
      .filter(col("__chunk") === col("__home"))
      .drop("__home", "__chunk")
  }
}
