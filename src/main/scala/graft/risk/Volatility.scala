package graft.risk

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rolling volatility statistics — reference `01_var_market_etl.py:160-188`:
 * over a trailing `windowDays`-calendar-day range window, collect the
 * 5-dim feature arrays and compute their element-wise mean (`vol_avg`)
 * and sample covariance matrix ddof=1 (`vol_cov`).
 *
 * The reference's window is UNPARTITIONED (one market series, ~500 rows) —
 * fine there, single-task at scale. `partitionCols` lets callers with many
 * series (per-ticker, per-region) keep the same API and get a parallel
 * plan; for one giant global series, chunk-by-time + overlap would be the
 * 100TB path (not needed for parity).
 */
object Volatility {

  def rollingStats(
      returns: DataFrame,
      dateCol: String = "date",
      featuresCol: String = "features",
      windowDays: Int = 90,
      partitionCols: Seq[String] = Nil): DataFrame = {
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(dateCol).cast("long"))
      .rangeBetween(-windowDays.toLong * 86400L, 0L)
    returns
      .withColumn("__window", collect_list(col(featuresCol)).over(w))
      // reference drops the first row of each window series (size > 1,
      // `01_var_market_etl.py:177`) — a 1-element window has no covariance
      .filter(size(col("__window")) > 1)
      .withColumn("vol_avg", functions.meanVectorUdf(col("__window")))
      .withColumn("vol_cov", functions.covMatrixUdf(col("__window")))
      .drop("__window")
  }
}
