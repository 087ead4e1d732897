package graft
// one-off reference-scale run (32k trials, 27 tickers, 5 indicators, ~520 business days)
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.risk._
object RefScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val runs = sys.env.getOrElse("REFSCALE_RUNS", "32000").toInt
    val cfg = VarPipeline.Config(
      tickers = (1 to 27).map(i => f"TICK$i%02d"),
      indicators = Seq("SP500", "NYSE", "OIL", "TREASURY", "DOWJONES"),
      days = 521, runs = runs)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"REFSCALE $name%-22s ${(System.nanoTime()-t0)/1e9}%8.1f s"); Console.flush(); r
    }
    val vol = time("volatility")({ val v = VarPipeline.marketVolatility(spark, cfg).cache(); println("  rows=" + v.count()); v })
    val weights = time("train-ols")({ val w = VarPipeline.trainedWeights(spark, cfg).cache(); println("  rows=" + w.count()); w })
    val atRun = AsOfJoin.asofJoinBroadcast(
        VarPipeline.runDates(spark, cfg), vol.select(col("date"), col("vol_avg"), col("vol_cov")), "date")
      .filter(col("right_vol_cov").isNotNull)
      .select(col("date"), col("right_vol_avg").as("vol_avg"), col("right_vol_cov").as("vol_cov"))
    val mc = time("simulate-market")({ val m = MonteCarlo.simulateMarket(atRun, cfg.runs, numPartitions = 32).cache(); println("  rows=" + m.count()); m })
    val fanned = mc.crossJoin(broadcast(VarPipeline.portfolio(spark, cfg).select(col("ticker"))))
    val scored = time("score")({ val sc = Training.score(fanned, weights, "ticker", "features", "return")
      .select(col("date"), col("ticker"), col("trial_id"), col("return")); println("  rows=" + sc.count()); sc })
    val trials = time("collect-vectors")({ val t = MonteCarlo.collectTrialVectors(scored).cache(); println("  rows=" + t.count()); t })
    time("var-timeseries")({ println("  rows=" + VarEngine.varTimeSeries(trials, VarPipeline.portfolio(spark, cfg)).count()) })
    time("var-by-industry")({ println("  rows=" + VarEngine.riskExposure(trials, VarPipeline.portfolio(spark, cfg), "industry").count()) })
    spark.stop()
  }
}
