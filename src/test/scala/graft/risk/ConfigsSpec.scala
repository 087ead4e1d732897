package graft.risk

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** File-based config sources (S2): readers for the three reference-shaped
 * config files and the end-to-end pipeline fed from them. */
class ConfigsSpec extends SparkSpec {

  private val dir = "src/test/resources/config"

  test("portfolio.json loads as a typed portfolio table") {
    val pf = Configs.portfolio(spark, s"$dir/portfolio.json")
    assert(pf.columns.sorted.toSeq ==
      Seq("company", "country", "industry", "ticker", "weight"))
    assert(pf.count() == 4)
    val wsum = pf.agg(sum(col("weight"))).collect()(0).getDouble(0)
    assert(math.abs(wsum - 1.0) < 1e-9)
    assert(pf.filter(col("ticker") === "TICK02").select(col("country"))
      .collect()(0).getString(0) == "CHILE")
  }

  test("indicators.json loads as (symbol, name) rows") {
    val ind = Configs.indicatorMap(spark, s"$dir/indicators.json")
    val rows = ind.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("^IXA" -> "IX1", "^IXB" -> "IX2", "^IXC" -> "IX3"))
  }

  test("application.yaml parses into AppConfig") {
    val app = Configs.application(s"$dir/application.yaml")
    assert(app.minDate == LocalDate.of(2020, 1, 1))
    assert(app.maxDate == LocalDate.of(2020, 5, 1))
    assert(app.modelName == "value_at_risk_test")
    assert(app.dbName == "graft_var_test")
    assert(app.tables("mc_trials") == "monte_carlo_trials")
    assert(app.executors == 4)
    assert(app.volatilityWindow == 60)
    assert(app.runs == 100)
  }

  test("fromFiles assembles a runnable Config + portfolio") {
    val (cfg, pf) = Configs.fromFiles(spark,
      s"$dir/application.yaml", s"$dir/portfolio.json", s"$dir/indicators.json")
    assert(cfg.tickers == Seq("TICK01", "TICK02", "TICK03", "TICK04"))
    assert(cfg.indicators == Seq("IX1", "IX2", "IX3"))
    assert(cfg.runs == 100)
    assert(cfg.volWindowDays == 60)
    assert(cfg.days == 121)
    assert(pf.count() == 4)
  }

  test("varBySlice runs end-to-end from a file-loaded portfolio") {
    val (cfg, pf) = Configs.fromFiles(spark,
      s"$dir/application.yaml", s"$dir/portfolio.json", s"$dir/indicators.json")
    val out = VarPipeline.varBySlice(spark, "country", cfg, Some(pf)).collect()
    assert(out.nonEmpty)
    val countries = out.map(_.getAs[String]("country")).distinct.sorted.toSeq
    assert(countries == Seq("CHILE", "MEXICO", "PERU"))
    // every (date, country) VaR is a finite loss quantile
    assert(out.forall { r =>
      val v = r.getAs[Double](s"var_${cfg.confidence.toInt}")
      !v.isNaN && !v.isInfinite
    })
  }
}
