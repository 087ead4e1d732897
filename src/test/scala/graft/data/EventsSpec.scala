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

  test("randomized: sessionize and cohorts match scalar references") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(600)(i =>
      (rnd.nextInt(12).toLong, i.toLong, rnd.nextInt(2000).toLong))
    val df = rows.toDF("user", "eid", "ts").repartition(7)

    // --- sessionize vs a scalar fold over (ts, eid)-sorted events
    val gap = 37L
    val gotS = Events.sessionize(df, Seq("user"), "ts", gap,
        tieBreak = Seq(col("eid")))
      .select(col("eid"), col("session_seq")).as[(Long, Long)]
      .collect().toMap
    rows.groupBy(_._1).foreach { case (_, evs) =>
      var seq = 0L; var prev = Option.empty[Long]
      evs.sortBy(e => (e._3, e._2)).foreach { case (_, eid, ts) =>
        if (prev.forall(p => ts - p > gap)) seq += 1
        prev = Some(ts)
        assert(gotS(eid) === seq, s"eid=$eid")
      }
    }

    // --- cohorts vs a scalar matrix: rescale ts so day = ts div 100
    //     (integer multiply only — Column `/` would go double)
    val dayDf = df.withColumn("ts", col("ts") * 864L)
    val gotC = Events.retentionCohorts(dayDf, Seq("user"), "ts")
      .select(col("cohort_day"), col("age_days"), col("n_active"))
      .as[(Long, Long, Long)].collect().toSet
    val byUserDay = rows.map { case (u, _, ts) => (u, ts * 864L / 86400L) }.distinct
    val firstDay = byUserDay.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val wantC = byUserDay.groupBy { case (u, d) => (firstDay(u), d - firstDay(u)) }
      .map { case (k, xs) => (k._1, k._2, xs.map(_._1).distinct.size.toLong) }.toSet
    assert(gotC === wantC)
  }

  test("randomized: funnel equals a scalar greedy chain") {
    val rnd = new scala.util.Random(7)
    val stepNames = Vector("s1", "s2", "s3")
    val rows = Seq.tabulate(400)(i =>
      (rnd.nextInt(25).toLong, stepNames(rnd.nextInt(3)), i.toLong))
    val df = rows.toDF("user", "et", "ts").repartition(5)
    val got = Events.funnel(df, Seq("user"), "ts", Seq(
        "s1" -> (col("et") === "s1"), "s2" -> (col("et") === "s2"),
        "s3" -> (col("et") === "s3")))
      .select(col("user"), col("t_1"), col("t_2"), col("t_3"))
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    rows.groupBy(_._1).foreach { case (u, evs) =>
      var stage = 0; var times = List.empty[Long]
      evs.sortBy(_._3).foreach { case (_, et, ts) =>
        if (stage < 3 && et == stepNames(stage) &&
            (stage == 0 || ts > times.head)) { stage += 1; times = ts :: times }
      }
      val t = times.reverse
      val want = (t.lift(0), t.lift(1), t.lift(2))
      got.get(u) match {
        case Some(g) => assert(g === want, s"user=$u")
        case None => assert(want._1.isEmpty, s"user=$u missing but $want")
      }
    }
  }

  test("transitionCounts: scalar walk parity, first event excluded") {
    val rows = Seq(
      // key 1: a->b->b->c ; key 2: c->a ; key 3: singleton (no pairs)
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "c"), (2L, 5L, 5L, "c"), (2L, 6L, 6L, "a"),
      (3L, 7L, 7L, "a"),
      // tie on ts within key 4: event_id breaks it -> x->y, not y->x
      (4L, 50L, 8L, "x"), (4L, 50L, 9L, "y"))
      .toDF("k", "ts", "eid", "st")
    val got = Events.transitionCounts(rows.repartition(5), Seq("k"), "ts",
        col("st"), tieBreak = Seq(col("eid")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 1L, ("b", "b") -> 1L, ("b", "c") -> 1L,
      ("c", "a") -> 1L, ("x", "y") -> 1L))
    // total transitions == events - keys
    assert(got.values.sum === 9L - 4L)
  }
}
