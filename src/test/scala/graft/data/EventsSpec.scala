package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Event-log analytics ([[Events]]): hand-computed sessions with the
 * strict-gap edge, order-sensitive funnel conversion, and the retention
 * matrix on a tiny constructed log.
 */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gaps strictly over the threshold open sessions") {
    val e = Seq(
      (1L, 10L, 100L), (1L, 11L, 130L), (1L, 12L, 160L), // gap 30 each
      (1L, 13L, 191L),                                   // gap 31 > 30: new
      (1L, 14L, 221L),                                   // gap 30: continues
      (2L, 20L, 500L))
      .toDF("user", "eid", "ts")
    val got = Events.sessionize(e, Seq("user"), "ts", gapSeconds = 30L,
        tieBreak = Seq(col("eid")))
      .select(col("eid"), col("session_seq"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(10L -> 1L, 11L -> 1L, 12L -> 1L,
      13L -> 2L, 14L -> 2L, 20L -> 1L))
  }

  test("sessionStats: exact bounds and durations") {
    val e = Seq((1L, 1L, 100L), (1L, 2L, 110L), (1L, 3L, 500L))
      .toDF("user", "eid", "ts")
    val got = Events.sessionStats(
        Events.sessionize(e, Seq("user"), "ts", 60L, Seq(col("eid"))),
        Seq("user"), "ts")
      .select(col("session_seq"), col("n_events"), col("t_start"),
        col("t_end"), col("duration_s"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 100L, 110L, 10L), (2L, 1L, 500L, 500L, 0L)))
  }

  test("funnel: order matters — later steps only count after earlier ones") {
    val e = Seq(
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "buy", 30L), // full
      (2L, "click", 5L), (2L, "signup", 10L), (2L, "buy", 20L),  // click BEFORE signup: breaks at click
      (3L, "signup", 10L), (3L, "buy", 15L), (3L, "click", 20L), // buy before click: breaks at buy
      (4L, "click", 9L))                                          // never signed up: not in funnel
      .toDF("user", "et", "ts")
    val times = Events.funnel(e, Seq("user"), "ts", Seq(
      "signup" -> (col("et") === "signup"),
      "click" -> (col("et") === "click"),
      "buy" -> (col("et") === "buy")))
    val got = times.select(col("user"), col("t_1"), col("t_2"), col("t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().toSet
    assert(got === Set(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), None, None),
      (3L, Some(10L), Some(20L), None)))
    val report = Events.funnelReport(times, Seq("signup", "click", "buy"))
      .select(col("step"), col("n_converted"), col("conversion_ppm"))
      .as[(Long, Long, Long)].collect().toSet
    assert(report === Set((1L, 3L, 1000000L), (2L, 2L, 666666L),
      (3L, 1L, 333333L)))
  }

  test("retentionCohorts: hand matrix with exact day arithmetic") {
    val day = 86400L
    val e = Seq(
      (1L, 0L * day), (1L, 1L * day + 5L), (1L, 3L * day),
      (2L, 0L * day + 100L), (2L, 3L * day + 1L),
      (3L, 1L * day), (3L, 1L * day + 10L)) // two events same day: one active
      .toDF("user", "ts")
    val got = Events.retentionCohorts(e, Seq("user"), "ts")
      .select(col("cohort_day"), col("age_days"), col("n_active"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 2L),
      (1L, 0L, 1L)))
  }

  test("windowed funnel: the deadline cuts late conversions only") {
    val e = Seq(
      (1L, "signup", 0L), (1L, "click", 50L), (1L, "buy", 90L),    // inside
      (2L, "signup", 0L), (2L, "click", 150L), (2L, "buy", 160L),  // click late
      (3L, "signup", 0L), (3L, "click", 50L), (3L, "buy", 150L))   // buy late
      .toDF("user", "et", "ts")
    val steps = Seq(
      "signup" -> (col("et") === "signup"),
      "click" -> (col("et") === "click"),
      "buy" -> (col("et") === "buy"))
    val got = Events.funnel(e, Seq("user"), "ts", steps,
        maxSpanSeconds = Some(100L))
      .select(col("user"), col("t_2"), col("t_3"))
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((Some(50L), Some(90L))),
      2L -> ((None, None)),
      3L -> ((Some(50L), None))))
    // without a deadline all three convert fully
    val free = Events.funnel(e, Seq("user"), "ts", steps)
      .filter(col("t_3").isNotNull).count()
    assert(free === 3L)
  }
}
