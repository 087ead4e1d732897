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

  test("bucketed tables join and aggregate exchange-free on the bucket key") {
    val loc = java.nio.file.Files.createTempDirectory("graft_wh4").toString
    Warehouse.createAndUse(spark, "graft_bucket_spec", loc)
    try {
      import spark.implicits._
      val trials = (1 to 5000).map(i => (s"T${i % 40}", i.toDouble)).toDF("ticker", "v")
      val pf = (0 until 40).map(i => (s"T$i", 1.0 / 40)).toDF("ticker", "weight")
      Warehouse.saveBucketedTable(spark, trials, "b_trials", Seq("ticker"), 8)
      Warehouse.saveBucketedTable(spark, pf, "b_portfolio", Seq("ticker"), 8)

      // disable auto-broadcast so the join must rely on bucketing alone
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Warehouse.table(spark, "b_trials")
          .join(Warehouse.table(spark, "b_portfolio"), Seq("ticker"))
          .groupBy(col("ticker")).agg(sum(col("v") * col("weight")).as("wv"))
        // values correct
        val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val exp = (1 to 5000).groupBy(i => s"T${i % 40}")
          .map { case (t, is) => t -> is.map(_.toDouble / 40).sum }
        assert(got.keySet == exp.keySet)
        exp.foreach { case (t, v) => assert(math.abs(got(t) - v) < 1e-9) }
        // bucketing co-located both sides: join + agg run with ZERO shuffle
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"expected shuffle-free plan, got:\n$plan")
        assert(plan.contains("SelectedBucketsCount"), "expected bucketed scans")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally Warehouse.teardown(spark, "graft_bucket_spec")
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

  test("incremental market ingest: upsert new days, VaR recomputes over the table") {
    // the reference's hinted incremental mode (application.yaml) spelled
    // with upsertTable: land a correction + new days into the stored
    // market table, recompute portfolio returns from the table
    val loc = java.nio.file.Files.createTempDirectory("graft_wh5").toString
    Warehouse.createAndUse(spark, "graft_incr_spec", loc)
    try {
      import spark.implicits._
      val day0 = Sources.syntheticMarketData(spark, cfg.tickers, cfg.start,
        cfg.days, globalSeed = cfg.seed)
      Warehouse.saveTable(spark, day0.withColumn("ver", lit(1L)),
        "market_data", Seq("ticker", "date"))
      val before = Warehouse.table(spark, "market_data").count()

      // a corrected close for one existing (ticker, date) + one new day per ticker
      val lastDate = day0.agg(max($"date")).head().getTimestamp(0)
      val correction = day0.filter($"date" === lastDate)
        .withColumn("close", $"close" * 1.5)
      val newDay = day0.filter($"date" === lastDate)
        .withColumn("date", date_add($"date", 1).cast("timestamp"))
      Warehouse.upsertTable(spark, "market_data",
        correction.unionByName(newDay).withColumn("ver", lit(2L)),
        Seq("ticker", "date"), "ver")

      val after = Warehouse.table(spark, "market_data")
      assert(after.count() == before + cfg.tickers.size) // upsert + insert
      // the correction won (close scaled by 1.5 on the corrected day)
      val corrected = after.filter($"date" === lastDate).agg(sum($"close")).head().getDouble(0)
      val original = day0.filter($"date" === lastDate).agg(sum($"close")).head().getDouble(0)
      assert(math.abs(corrected - original * 1.5) < 1e-6)
      // downstream recompute runs off the stored table
      val rets = Compliance.portfolioReturns(after, VarPipeline.portfolio(spark, cfg))
      assert(rets.count() > 0)
    } finally Warehouse.teardown(spark, "graft_incr_spec")
  }

  test("upsertTable: latest version wins, updates shadow at equal version") {
    val loc = java.nio.file.Files.createTempDirectory("graft_wh4").toString
    Warehouse.createAndUse(spark, "graft_upsert_spec", loc)
    try {
      import spark.implicits._
      val base = Seq(("k1", 1L, "old1"), ("k2", 1L, "old2"), ("k3", 5L, "keep3"))
        .toDF("k", "ver", "payload")
      Warehouse.saveTable(spark, base, "upsert_t", Seq("k"))
      val updates = Seq(
        ("k1", 2L, "new1"),  // newer version replaces
        ("k3", 5L, "tie3"),  // equal version: update wins
        ("k4", 1L, "ins4"))  // brand-new key inserts
        .toDF("k", "ver", "payload")
      Warehouse.upsertTable(spark, "upsert_t", updates, Seq("k"), "ver")
      val got = Warehouse.table(spark, "upsert_t")
        .select($"k", $"ver", $"payload").as[(String, Long, String)]
        .collect().sorted.toSeq
      assert(got == Seq(("k1", 2L, "new1"), ("k2", 1L, "old2"),
        ("k3", 5L, "tie3"), ("k4", 1L, "ins4")))
      // stale update does NOT regress the row
      val stale = Seq(("k1", 1L, "stale1")).toDF("k", "ver", "payload")
      Warehouse.upsertTable(spark, "upsert_t", stale, Seq("k"), "ver")
      val k1 = Warehouse.table(spark, "upsert_t").filter($"k" === "k1")
        .select($"payload").as[String].collect().toSeq
      assert(k1 == Seq("new1"))
    } finally Warehouse.teardown(spark, "graft_upsert_spec")
  }

  test("upsertTable with a qualified db.tbl name drops its staging table") {
    val loc = java.nio.file.Files.createTempDirectory("graft_wh6").toString
    Warehouse.createAndUse(spark, "graft_qual_spec", loc)
    try {
      import spark.implicits._
      val base = Seq(("k1", 1L, "a")).toDF("k", "ver", "payload")
      Warehouse.saveTable(spark, base, "graft_qual_spec.q_t", Seq("k"))
      Warehouse.upsertTable(spark, "graft_qual_spec.q_t",
        Seq(("k1", 2L, "b")).toDF("k", "ver", "payload"), Seq("k"), "ver")
      val got = Warehouse.table(spark, "graft_qual_spec.q_t")
        .select($"payload").as[String].collect().toSeq
      assert(got == Seq("b"))
      // whole-name backticks would leave the staging table behind
      assert(!spark.catalog.tableExists("graft_qual_spec.q_t__upsert_staging"))
    } finally Warehouse.teardown(spark, "graft_qual_spec")
  }
}
