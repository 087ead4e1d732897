package graft.risk

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Market-data sources. The reference fetches OHLCV from yfinance inside a
 * grouped-map pandas UDF (`/root/reference/utils/var_utils.py:1-15`,
 * `01_var_market_etl.py:49-64`); this container has zero egress, so the
 * source is the reference's own synthetic random-walk generator
 * (`generate_prices`, `utils/var_utils.py:18-27`) seeded per ticker and
 * run DISTRIBUTED: one task per ticker via `groupByKey.flatMapGroups` —
 * the same physical shape as the reference's grouped-map download.
 */
object Sources {

  case class Bar(ticker: String, date: java.sql.Timestamp,
      open: Double, high: Double, low: Double, close: Double, volume: Double)

  /** Reference `generate_prices` (`utils/var_utils.py:18-27`): discrete
   * random walk p[i] = max(0, p[i-1] * (1 + shock)),
   * shock ~ N(mu/days, sigma*sqrt(1/days)), deterministic per seed. */
  def generatePath(startPrice: Double, mu: Double, sigma: Double, days: Int,
      seed: Long): Array[Double] = {
    val rng = new java.util.Random(seed)
    val rate = 1.0 / days
    val out = new Array[Double](days)
    out(0) = startPrice
    var i = 1
    while (i < days) {
      val shock = mu * rate + sigma * math.sqrt(rate) * rng.nextGaussian()
      out(i) = math.max(0.0, out(i - 1) + shock * out(i - 1))
      i += 1
    }
    out
  }

  /** Business days (Mon-Fri) from `start`, `n` of them. */
  def businessDays(start: LocalDate, n: Int): IndexedSeq[LocalDate] =
    Iterator.iterate(start)(_.plusDays(1))
      .filter(d => d.getDayOfWeek.getValue <= 5)
      .take(n).toIndexedSeq

  /**
   * Synthetic OHLCV market table: one GBM path per ticker on a shared
   * business-day calendar, deterministic per (globalSeed, ticker).
   * Distributed per ticker — the `market_data` table shape
   * (`01_var_market_etl.py:37-64`).
   */
  def syntheticMarketData(
      spark: SparkSession,
      tickers: Seq[String],
      start: LocalDate,
      days: Int,
      startPrice: Double = 100.0,
      mu: Double = 0.05,
      sigma: Double = 0.3,
      globalSeed: Long = 42L): DataFrame = {
    import spark.implicits._
    val dayList = businessDays(start, days)
    spark
      .createDataset(tickers)
      .repartition(math.min(tickers.size, 64))
      .flatMap { t =>
        val seed = globalSeed ^ scala.util.hashing.MurmurHash3.stringHash(t).toLong
        val closes = generatePath(startPrice, mu, sigma, days, seed)
        val rng = new java.util.Random(seed + 1)
        dayList.indices.map { i =>
          val c = closes(i)
          val spread = math.abs(rng.nextGaussian()) * 0.01 * c
          Bar(t, java.sql.Timestamp.valueOf(dayList(i).atStartOfDay()),
            open = c - spread / 2, high = c + spread, low = math.max(0, c - spread),
            close = c, volume = math.abs(rng.nextGaussian()) * 1e6)
        }
      }
      .toDF()
  }

  /** Synthetic market-indicator table (one column per indicator + date) —
   * the `market_indicators` shape (`01_var_market_etl.py:102-119`). */
  def syntheticIndicators(
      spark: SparkSession,
      indicators: Seq[String],
      start: LocalDate,
      days: Int,
      globalSeed: Long = 43L): DataFrame = {
    val dayList = businessDays(start, days)
    val paths = indicators.map { name =>
      name -> generatePath(1000.0, 0.03, 0.2, days,
        globalSeed ^ scala.util.hashing.MurmurHash3.stringHash(name).toLong)
    }
    import spark.implicits._
    val rows = dayList.indices.map { i =>
      (java.sql.Timestamp.valueOf(dayList(i).atStartOfDay()), paths.map(_._2(i)))
    }
    val base = spark.createDataset(rows).toDF("date", "__vals")
    indicators.zipWithIndex.foldLeft(base) { case (df, (name, i)) =>
      df.withColumn(name, col("__vals")(i))
    }.drop("__vals")
  }
}
