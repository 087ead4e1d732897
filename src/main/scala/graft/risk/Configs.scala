package graft.risk

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.LocalDate
import java.time.temporal.ChronoUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/**
 * File-based configuration sources (S2) — the reference loads
 * `config/portfolio.json`, `config/indicators.json` and
 * `config/application.yaml` at `config/configure_notebook.py:31-38`; this
 * is the same surface as Spark readers + snakeyaml (shipped in Spark's
 * jars), feeding [[VarPipeline.Config]] so a user can point the engine at
 * their own portfolio instead of the compiled-in synthetic one.
 */
object Configs {

  /** `application.yaml` subset the engine consumes (reference keys kept
   * verbatim; `tables` feeds the warehouse hand-off). */
  case class AppConfig(
      minDate: LocalDate,
      maxDate: LocalDate,
      modelName: String,
      modelDate: LocalDate,
      dbName: String,
      dbPath: String,
      tables: Map[String, String],
      executors: Int,
      volatilityWindow: Int,
      runs: Int)

  /**
   * Portfolio table from a records-oriented JSON array shaped like
   * `config/portfolio.json`: one object per instrument with
   * `country/company/ticker/industry/weight`. `multiLine` because the
   * reference file is a pretty-printed array, not JSONL.
   */
  def portfolio(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)
      .select(col("ticker").cast("string"), col("company").cast("string"),
        col("country").cast("string"), col("industry").cast("string"),
        col("weight").cast("double"))

  /**
   * Indicator map from an object-shaped JSON (`{"^GSPC": "SP500", ...}`)
   * like `config/indicators.json` — read as whole text and exploded via
   * `from_json` into `(symbol, name)` rows, so symbols with glob
   * characters never become column names.
   */
  def indicatorMap(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", true).text(path)
      .select(explode(from_json(col("value"), MapType(StringType, StringType)))
        .as(Seq("symbol", "name")))

  /** Parse `application.yaml` (reference shape) into [[AppConfig]]. */
  def application(path: String): AppConfig = {
    val text = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](text).asScala

    def section(k: String): Map[String, Object] =
      root.get(k).map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap)
        .getOrElse(Map.empty)

    val yf = section("yfinance")
    val model = section("model")
    val db = section("database")
    val mc = section("monte-carlo")
    AppConfig(
      minDate = LocalDate.parse(yf("mindate").toString),
      maxDate = LocalDate.parse(yf("maxdate").toString),
      modelName = model("name").toString,
      modelDate = LocalDate.parse(model("date").toString),
      dbName = db("name").toString,
      dbPath = db("path").toString,
      tables = db("tables").asInstanceOf[java.util.Map[String, Object]]
        .asScala.map { case (k, v) => k -> v.toString }.toMap,
      executors = mc("executors").toString.toInt,
      volatilityWindow = mc("volatility").toString.toInt,
      runs = mc("runs").toString.toInt)
  }

  /**
   * Assemble a [[VarPipeline.Config]] plus the portfolio table from the
   * three reference-shaped config files: tickers come from the portfolio,
   * indicator names from the indicator map, horizon/runs/window from the
   * yaml. The two collects are over config files (KBs), not data.
   */
  def fromFiles(
      spark: SparkSession,
      applicationYaml: String,
      portfolioJson: String,
      indicatorsJson: String,
      seed: Long = 42L): (VarPipeline.Config, DataFrame) = {
    val app = application(applicationYaml)
    val pf = portfolio(spark, portfolioJson)
    val tickers = pf.select(col("ticker")).collect().map(_.getString(0)).toSeq.sorted
    val indicators = indicatorMap(spark, indicatorsJson)
      .select(col("name")).collect().map(_.getString(0)).toSeq.sorted
    val cfg = VarPipeline.Config(
      tickers = tickers,
      indicators = indicators,
      start = app.minDate,
      days = ChronoUnit.DAYS.between(app.minDate, app.maxDate).toInt.max(1),
      runs = app.runs,
      volWindowDays = app.volatilityWindow,
      seed = seed)
    (cfg, pf)
  }
}
