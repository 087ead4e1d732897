package graft.risk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Log-return computation — reference `02_var_model.py:52-64` (stocks, W1)
 * and `01_var_market_etl.py:135-154` (indicators, P7).
 *
 * Both are pure window/native expressions: one shuffle on the partition
 * key, whole-stage codegen for the arithmetic. The reference instead
 * round-trips the whole indicator table through driver pandas
 * (`01_var_market_etl.py:137`) — semantics preserved, plan fixed.
 */
object Returns {

  /**
   * Daily log return per series: ln(close / prev_close), where prev_close
   * is `first(close)` over a 2-row trailing window — reference W1 exactly
   * (`02_var_model.py:55-62`): the FIRST row of each series yields
   * ln(close/close) = 0.0, not null (lag would give null).
   */
  def dailyLogReturns(
      prices: DataFrame,
      tickerCol: String = "ticker",
      dateCol: String = "date",
      closeCol: String = "close",
      outCol: String = "return",
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(tickerCol))
      .orderBy(col(dateCol) +: tieBreakCols.map(col): _*)
      .rowsBetween(-1, 0)
    prices
      .filter(col(closeCol).isNotNull)
      .withColumn("__first", first(col(closeCol)).over(w))
      .withColumn(outCol, functions.logReturn(col(closeCol), col("__first")))
      .drop("__first")
  }

  /**
   * Indicator log returns: for each indicator column c,
   * ln(lag(c) / c) — the reference's INVERTED sign convention
   * (`01_var_market_etl.py:144`: `np.log(shift(1)/df)`), preserved for
   * parity. First row (no lag) is dropped, matching `dropna()`.
   * Output keeps `dateCol` + one return column per indicator + a packed
   * `features` array (P8).
   */
  def indicatorLogReturns(
      indicators: DataFrame,
      dateCol: String = "date",
      indicatorCols: Seq[String]): DataFrame = {
    // one global series: chunked lag (Windows.chunkedLag) instead of an
    // unpartitioned window, so the plan parallelizes at scale; exact for
    // gaps ≤ the chunk length (3 years on a daily series)
    val lagged = Windows.chunkedLag(indicators, dateCol, indicatorCols)
    val withRets = indicatorCols.foldLeft(lagged) { (df, c) =>
      df.withColumn(c, functions.indicatorLogReturn(col("__lag_" + c), col(c)))
    }
    withRets
      .na.drop(indicatorCols)
      .select(col(dateCol) +: indicatorCols.map(col) :+
        array(indicatorCols.map(col): _*).as("features"): _*)
  }
}
