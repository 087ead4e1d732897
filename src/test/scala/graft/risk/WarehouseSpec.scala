package graft.risk

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DDL surface (S7) + persisted warehouse hand-off (S3/S4): the
 * reference's configure_notebook.py:17-27 database lifecycle and the
 * 03 → 04/05 stored-table workflow. */
class WarehouseSpec extends SparkSpec {

  private val cfg = VarPipeline.Config(
    runs = 60, days = 100, tickers = Seq("TICK01", "TICK02", "TICK03"),
    indicators = Seq("IX1", "IX2"))

  test("database lifecycle: create at location, use, teardown cascade") {
    val loc = java.nio.file.Files.createTempDirectory("graft_wh").toString
    Warehouse.createAndUse(spark, "graft_ddl_spec", loc)
    assert(spark.catalog.currentDatabase == "graft_ddl_spec")
    assert(spark.catalog.databaseExists("graft_ddl_spec"))
    Warehouse.teardown(spark, "graft_ddl_spec")
    assert(!spark.catalog.databaseExists("graft_ddl_spec"))
    assert(spark.catalog.currentDatabase == "default")
  }

  test("trials hand-off: stored table round-trips and VaR matches the fresh plan") {
    val loc = java.nio.file.Files.createTempDirectory("graft_wh2").toString
    Warehouse.createAndUse(spark, "graft_handoff_spec", loc)
    try {
      val tables = Map("volatility" -> "market_volatility",
        "mc_trials" -> "monte_carlo_trials")
      VarPipeline.materializeHandoff(spark, cfg, tables)

      val stored = Warehouse.table(spark, tables("mc_trials"))
      val fresh = VarPipeline.monteCarloTrials(spark, cfg)
      assert(stored.count() == fresh.count())

      // on-demand VaR from the STORED table equals the all-in-one plan
      val pf = VarPipeline.portfolio(spark, cfg)
      def canon(df: org.apache.spark.sql.DataFrame) =
        VarEngine.varTimeSeries(df, pf)
          .select(col("date").cast("string"), round(col("var_99"), 9))
          .collect().map(_.toString).sorted.toSeq
      assert(canon(stored) == canon(fresh))

      // volatility table also round-trips
      val vol = Warehouse.table(spark, tables("volatility"))
      assert(vol.count() ==
        VarPipeline.marketVolatility(spark, cfg).count())
    } finally Warehouse.teardown(spark, "graft_handoff_spec")
  }

  test("clustered table write prunes files on the cluster key") {
    val loc = java.nio.file.Files.createTempDirectory("graft_wh3").toString
    Warehouse.createAndUse(spark, "graft_prune_spec", loc)
    try {
      import spark.implicits._
      val df = (1 to 20000).map(i => (i % 200, s"T${i % 7}", i.toDouble))
        .toDF("date", "ticker", "v")
      Warehouse.saveTable(spark, df, "clustered_t", Seq("date", "ticker"), numFiles = 8)
      val back = Warehouse.table(spark, "clustered_t")
      assert(back.count() == 20000)
      val allFiles = back.select(input_file_name()).distinct().count()
      val hitFiles = back.filter(col("date") === 5)
        .select(input_file_name()).distinct().count()
      assert(allFiles == 8, s"expected 8 files, got $allFiles")
      // range clustering: a point lookup on the leading key touches 1 file
      assert(hitFiles == 1, s"expected 1 file hit, got $hitFiles")
    } finally Warehouse.teardown(spark, "graft_prune_spec")
  }
}
