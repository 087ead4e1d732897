package graft.risk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Basel backtesting — reference `05_var_compliance.py`: actual weighted
 * portfolio returns per day, overlaid as-of with the VaR-99 series, then
 * trailing-250-day breach counting -> traffic-light zones, forward-filled
 * to a daily calendar.
 */
object Compliance {

  /** Daily weighted portfolio return: W1 log returns per ticker, weighted
   * by portfolio weight, summed per date (`05_var_compliance.py:23-53`). */
  def portfolioReturns(
      stocks: DataFrame,
      portfolio: DataFrame,
      tickerCol: String = "ticker",
      dateCol: String = "date",
      closeCol: String = "close"): DataFrame = {
    val rets = Returns.dailyLogReturns(stocks, tickerCol, dateCol, closeCol)
    rets
      .join(broadcast(portfolio), Seq(tickerCol))
      .withColumn("weighted_return",
        functions.weightedReturn(col("return"), col("weight")))
      .groupBy(col(dateCol))
      .agg(sum(col("weighted_return")).as("return"))
  }

  /**
   * Breach counting + zones: as-of attach the latest var_99 to each daily
   * return, then over a trailing `windowDays`-calendar-day range window
   * collect returns and count those <= var_99; zone per [[VarMath.baselZone]]
   * (`05_var_compliance.py:84-125`).
   */
  def baselBacktest(
      dailyReturns: DataFrame,
      varSeries: DataFrame,
      dateCol: String = "date",
      windowDays: Int = 250): DataFrame = {
    val overlaid = AsOfJoin
      .asofJoinBroadcast(dailyReturns, varSeries, dateCol)
      .filter(col("right_var_99").isNotNull)
    // trailing window via time-chunking (Windows.chunkedTrailingRange):
    // shuffle-on-chunk + parallel windows instead of the single-task
    // unpartitioned spelling; results identical
    Windows.chunkedTrailingRange(overlaid, dateCol, windowDays,
        chunkDays = windowDays,
        ("__trailing", collect_list(col("return"))))
      .withColumn("breaches",
        functions.breachCount(col("__trailing"), col("right_var_99")))
      .withColumn("basel", functions.baselZone(col("breaches")))
      .drop("__trailing")
  }
}
