package graft

import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.risk.{AsOfJoin, Calendar, MonteCarlo, Returns, Training, VarPipeline, functions => R}

/**
 * Driver contract — one `queries` entry per implemented operator from
 * SURVEY.md §2, each with a DuckDB `oracleSql` twin where ANSI-expressible
 * (seeded Monte-Carlo stays rows-only; SURVEY §7.5).
 *
 * Float policy: every floating aggregate is `round`ed identically on both
 * sides so summation-order ULP noise can't break the driver's hash compare.
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS); with
   * `spark.sql.legacy.parquet.nanosAsLong=true` it loads as long nanos —
   * normalize to a micros TIMESTAMP (UTC session). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case _ => raw
    }
  }

  /** Flagship: full Monte-Carlo VaR time-series on the synthetic market
   * (smoke-checked rows>0 by the driver). */
  def entry(spark: SparkSession): DataFrame =
    VarPipeline.portfolioVar(spark,
      VarPipeline.Config(runs = 200, days = 120,
        tickers = (1 to 4).map(i => s"TICK0$i")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------- relational core
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "q03_join_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("r_name"), col("n_name"))
    }),
    "q04_cross_join" -> ((s, dir) => {
      t(s, dir, "region")
        .crossJoin(t(s, dir, "orders").select(col("o_orderstatus")).distinct())
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus"))
    }),
    // ------------------------------------------- windows / returns (W1/P6)
    "q05_window_returns" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("event_id"), col("ts"), col("value"))
      Returns.dailyLogReturns(ev, "user_id", "ts", "value", "ret", Seq("event_id"))
        .groupBy(col("user_id"))
        .agg(round(sum(col("ret")), 6).as("sum_ret"), count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),
    "q06_rolling_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderdate").cast("long"))
        .rangeBetween(-90L * 86400L, 0L)
      // exact integer cents: float summation order and round-half rules
      // differ between engines, so keep the window outputs integral
      t(s, dir, "orders")
        .withColumn("__cents", round(col("o_totalprice") * 100, 0).cast("long"))
        .withColumn("rolling_sum_cents", sum(col("__cents")).over(w))
        .withColumn("rolling_n", count(lit(1)).over(w))
        .select(col("o_orderkey"), col("rolling_sum_cents"), col("rolling_n"))
        .orderBy(col("o_orderkey"))
    }),
    // ---------------------------------------------- VaR math (V1/V2/V3)
    "q07_var_es" -> ((s, dir) => {
      events(s, dir)
        .groupBy(col("event_type"))
        .agg(collect_list(col("value")).as("sims"))
        .select(col("event_type"),
          round(R.varAt(col("sims"), lit(99.0)), 6).as("var_99"),
          round(R.varAt(col("sims"), lit(95.0)), 6).as("var_95"),
          round(R.shortfallAt(col("sims"), lit(95.0)), 6).as("es_95"))
        .orderBy(col("event_type"))
    }),
    "q09_breach_zones" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-7L * 86400L, 0L)
      events(s, dir)
        .withColumn("trailing", collect_list(col("value")).over(w))
        .withColumn("b", R.breachCount(col("trailing"), lit(0.3)))
        .withColumn("zone", R.baselZone(col("b")))
        .groupBy(col("user_id"))
        .agg(sum(col("b")).as("sum_breaches"), sum(col("zone")).as("sum_zone"))
        .orderBy(col("user_id"))
    }),
    // ------------------------------------------------- calendar ffill (J6)
    "q10_calendar_ffill" -> ((s, dir) => {
      val ev = events(s, dir).select(col("user_id"), col("ts"), col("value"))
      Calendar.reindexFfill(ev, Seq("user_id"), "ts", Seq("value"))
        .groupBy(col("user_id"))
        .agg(count(col("value")).as("n_filled"), round(sum(col("value")), 4).as("sum_v"))
        .orderBy(col("user_id"))
    }),
    // ------------------------------------- features + model (P13/P14/A2)
    "q11_nonlinear_features" -> ((s, dir) => {
      val f = R.nonLinearFeatures(array(col("l_discount") - 0.05, col("l_tax") - 0.04))
      t(s, dir, "lineitem")
        .withColumn("f", f)
        .groupBy(col("l_returnflag"))
        .agg(round(sum(element_at(col("f"), 1)), 6).as("f0"),
          (1 until 8).map(i => round(sum(element_at(col("f"), i + 1)), 6).as(s"f$i")): _*)
        .orderBy(col("l_returnflag"))
    }),
    "q12_group_ols" -> ((s, dir) => {
      import s.implicits._
      val rows = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("g"), col("l_quantity").as("x"),
          col("l_extendedprice").as("y"))
        .as[(String, Double, Double)]
      rows.groupByKey(_._1)
        .mapGroups { (g, it) =>
          val a = it.toArray
          val w = Training.fitOls(a.map(r => Array(r._2)), a.map(_._3))
          (g, w(0), w(1))
        }
        .toDF("l_returnflag", "intercept", "slope")
        .select(col("l_returnflag"), round(col("intercept"), 2).as("intercept"),
          round(col("slope"), 4).as("slope"))
        .orderBy(col("l_returnflag"))
    }),
    // ------------------------------------------------------ as-of join (J5)
    "q13_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pv"))
      AsOfJoin.asofJoin(clicks, purch, "ts", Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(col("right_pv")).as("n_matched"),
          round(sum(col("right_pv")), 4).as("sum_pv"))
        .orderBy(col("user_id"))
    }),
    "q13b_asof_broadcast" -> ((s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      val purch = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pv"))
      AsOfJoin.asofJoinBroadcast(clicks, purch, "ts", Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(count(col("right_pv")).as("n_matched"),
          round(sum(col("right_pv")), 4).as("sum_pv"))
        .orderBy(col("user_id"))
    }),
    // --------------------------------------- vector aggregation (P10/A7)
    "q14_weighted_vector_sum" -> ((s, dir) => {
      val weighted = t(s, dir, "embeddings")
        .withColumn("v", R.arrayToVector(col("embedding").cast("array<double>")))
        .withColumn("wv", R.weightedVector(col("v"), lit(1.0) / (lit(1.0) + col("label"))))
      weighted.groupBy(col("label"))
        .agg(Summarizer.sum(col("wv")).as("sv"))
        .select(col("label"), posexplode(R.vectorToArray(col("sv"))))
        .select(col("label"), col("pos").cast("long").as("i"),
          round(col("col"), 4).as("val"))
        .orderBy(col("label"), col("i"))
    }),
    // -------------------------------------------------- pivot / misc (A11)
    "q15_pivot_shares" -> ((s, dir) => {
      val p = t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice")))
      val tot = coalesce(col("F"), lit(0.0)) + coalesce(col("O"), lit(0.0)) +
        coalesce(col("P"), lit(0.0))
      p.select(col("o_orderpriority"),
        round(coalesce(col("F"), lit(0.0)) / tot, 6).as("f_share"),
        round(coalesce(col("O"), lit(0.0)) / tot, 6).as("o_share"),
        round(coalesce(col("P"), lit(0.0)) / tot, 6).as("p_share"))
        .orderBy(col("o_orderpriority"))
    }),
    "q16_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
        .select(col("doc_id"), col("n_dups"))
        .orderBy(col("doc_id"))
    }),
    "q17_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
    }),
    "q18_distinct" -> ((s, dir) => {
      events(s, dir).select(col("event_type")).distinct()
        .orderBy(col("event_type"))
    }),
    // ------------------------------- Monte-Carlo chain (rows-only checks)
    "q30_mc_portfolio_var" -> ((s, _) => {
      VarPipeline.portfolioVar(s, miniCfg)
    }),
    "q31_var_by_country" -> ((s, _) => {
      VarPipeline.varBySlice(s, "country", miniCfg)
    }),
    "q32_compliance" -> ((s, _) => {
      VarPipeline.compliance(s, miniCfg)
    }),
    "q33_mc_trials" -> ((s, _) => {
      import org.apache.spark.sql.functions.{col => c}
      VarPipeline.monteCarloTrials(s, miniCfg)
        .select(c("date"), c("ticker"), R.varAtVec(c("returns"), lit(95.0)).as("var_95"))
        .orderBy(c("date"), c("ticker"))
    })
  )

  private val miniCfg = VarPipeline.Config(
    runs = 500, days = 120, tickers = (1 to 6).map(i => s"TICK0$i"),
    indicators = Seq("IX1", "IX2", "IX3"))

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),4) AS sum_qty,
        |round(sum(l_extendedprice),4) AS sum_base,
        |round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc,
        |round(avg(l_quantity),6) AS avg_qty, count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |round(l_extendedprice*(1-l_discount),4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_revenue" ->
      """SELECT r_name, n_name,
        |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q04_cross_join" ->
      """SELECT r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_name, o_orderstatus""".stripMargin,
    "q05_window_returns" ->
      """SELECT user_id, round(sum(ln(value/pv)),6) AS sum_ret, count(*) AS n
        |FROM (SELECT user_id, value,
        |  first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS pv FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q06_rolling_window" ->
      """SELECT o_orderkey,
        |CAST(sum(cents) OVER w AS BIGINT) AS rolling_sum_cents,
        |count(*) OVER w AS rolling_n
        |FROM (SELECT o_orderkey, o_orderpriority, o_orderdate,
        |      CAST(round(o_totalprice*100,0) AS BIGINT) AS cents FROM orders)
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q07_var_es" ->
      """WITH q AS (SELECT event_type, quantile_cont(value, 0.01) AS v99,
        |  quantile_cont(value, 0.05) AS v95 FROM events GROUP BY 1)
        |SELECT e.event_type, round(max(q.v99),6) AS var_99,
        |  round(max(q.v95),6) AS var_95,
        |  round(avg(CASE WHEN e.value <= q.v95 THEN e.value END),6) AS es_95
        |FROM events e JOIN q USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q09_breach_zones" ->
      """SELECT user_id, CAST(sum(b) AS BIGINT) AS sum_breaches,
        |CAST(sum(CASE WHEN b<=3 THEN 0 WHEN b<10 THEN 1 ELSE 2 END) AS BIGINT) AS sum_zone
        |FROM (SELECT user_id,
        |  sum(CASE WHEN value <= 0.3 THEN 1 ELSE 0 END) OVER (
        |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS b FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q10_calendar_ffill" ->
      """WITH bounds AS (SELECT CAST(min(ts) AS DATE) lo, CAST(max(ts) AS DATE) hi FROM events),
        |days AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        |users AS (SELECT DISTINCT user_id FROM events),
        |daily AS (SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS v FROM events GROUP BY 1,2),
        |ffill AS (SELECT u.user_id, d.day,
        |  last_value(dv.v IGNORE NULLS) OVER (PARTITION BY u.user_id ORDER BY d.day) AS v
        |  FROM users u CROSS JOIN days d
        |  LEFT JOIN daily dv ON dv.user_id=u.user_id AND dv.day=d.day)
        |SELECT user_id, count(v) AS n_filled, round(sum(v),4) AS sum_v
        |FROM ffill GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q11_nonlinear_features" ->
      """SELECT l_returnflag,
        |round(sum(x1),6) AS f0, round(sum(sign(x1)*x1*x1),6) AS f1,
        |round(sum(x1*x1*x1),6) AS f2, round(sum(sign(x1)*sqrt(abs(x1))),6) AS f3,
        |round(sum(x2),6) AS f4, round(sum(sign(x2)*x2*x2),6) AS f5,
        |round(sum(x2*x2*x2),6) AS f6, round(sum(sign(x2)*sqrt(abs(x2))),6) AS f7
        |FROM (SELECT l_returnflag, l_discount-0.05 AS x1, l_tax-0.04 AS x2 FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q12_group_ols" ->
      """SELECT l_returnflag,
        |round(regr_intercept(l_extendedprice, l_quantity),2) AS intercept,
        |round(regr_slope(l_extendedprice, l_quantity),4) AS slope
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q13_asof_join" ->
      """WITH clicks AS (SELECT user_id, ts, value FROM events WHERE event_type='click'),
        |purch AS (SELECT user_id, ts, max(value) AS pv FROM events
        |  WHERE event_type='purchase' GROUP BY 1,2)
        |SELECT c.user_id, count(p.pv) AS n_matched, round(sum(p.pv),4) AS sum_pv
        |FROM clicks c ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    "q13b_asof_broadcast" ->
      """WITH clicks AS (SELECT user_id, ts, value FROM events WHERE event_type='click'),
        |purch AS (SELECT user_id, ts, max(value) AS pv FROM events
        |  WHERE event_type='purchase' GROUP BY 1,2)
        |SELECT c.user_id, count(p.pv) AS n_matched, round(sum(p.pv),4) AS sum_pv
        |FROM clicks c ASOF LEFT JOIN purch p ON c.user_id = p.user_id AND c.ts >= p.ts
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    "q14_weighted_vector_sum" ->
      """SELECT label, i, round(sum(CAST(e AS DOUBLE) * (1.0/(1.0+label))),4) AS val
        |FROM (SELECT label, unnest(embedding) AS e,
        |      unnest(range(len(embedding))) AS i FROM embeddings)
        |GROUP BY label, i ORDER BY label, i""".stripMargin,
    "q15_pivot_shares" ->
      """SELECT o_orderpriority,
        |round(coalesce(f,0)/(coalesce(f,0)+coalesce(o,0)+coalesce(p,0)),6) AS f_share,
        |round(coalesce(o,0)/(coalesce(f,0)+coalesce(o,0)+coalesce(p,0)),6) AS o_share,
        |round(coalesce(p,0)/(coalesce(f,0)+coalesce(o,0)+coalesce(p,0)),6) AS p_share
        |FROM (SELECT o_orderpriority,
        |  sum(CASE WHEN o_orderstatus='F' THEN o_totalprice END) AS f,
        |  sum(CASE WHEN o_orderstatus='O' THEN o_totalprice END) AS o,
        |  sum(CASE WHEN o_orderstatus='P' THEN o_totalprice END) AS p
        |  FROM orders GROUP BY o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
    "q16_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_dups
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q17_topk" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q18_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type"
  )
}
