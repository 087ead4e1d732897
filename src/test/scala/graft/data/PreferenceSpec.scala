package graft.data

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("winCounts aggregates directions separately, drops self/null pairs") {
    val comp = Seq(
      ("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"),
      ("c", "c"),                    // self: dropped
      (null.asInstanceOf[String], "b") // null: dropped
    ).toDF("w", "l")
    val got = Preference.winCounts(comp, "w", "l")
      .orderBy($"winner", $"loser")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "a", 1L)))
  }

  test("bradleyTerry matches a scalar reference of the same integer MM") {
    // a beats b 3:1, b beats c 3:1, a beats c 2:0 — transitive chain
    val comp = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(3)(("b", "c")) ++ Seq(("c", "b")) ++
      Seq.fill(2)(("a", "c"))).toDF("w", "l")
    val got = Preference.bradleyTerry(comp, "w", "l", iters = 3)
      .orderBy($"item")
      .select($"item", $"rating_micro", $"wins", $"games")
      .as[(String, Long, Long, Long)].collect().toSeq

    // scalar mirror of the documented update (same floor divisions)
    val items = Seq("a", "b", "c")
    val pairs = Map(("a", "b") -> 4L, ("b", "c") -> 4L, ("a", "c") -> 2L)
    val wins = Map("a" -> 5L, "b" -> 4L, "c" -> 1L)
    var p = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val t = pairs.map { case ((x, y), n) =>
        (x, y) -> (n * 1000000000000L) / (p(x) + p(y)) }
      val d = items.map { i =>
        i -> t.collect { case ((x, y), v) if x == i || y == i => v }.sum
      }.toMap
      val raw = items.map { i =>
        i -> math.max((wins(i) * 1000000000000L) / d(i), 1L) }.toMap
      val tot = raw.values.sum
      p = raw.map { case (i, v) =>
        i -> (v * 1000000L) / math.max(tot / items.size, 1L) }
    }
    val expect = items.map(i =>
      (i, p(i), wins(i), pairs.collect {
        case ((x, y), n) if x == i || y == i => n }.sum))
    assert(got == expect, s"got=$got expect=$expect")
    // ranking respects the win chain
    val byRating = got.sortBy(-_._2).map(_._1)
    assert(byRating == Seq("a", "b", "c"))
  }

  test("bradleyTerry is partition-order invariant") {
    val comp = (0 until 200).map { i =>
      (s"m${i % 5}", s"m${(i * 3 + 1) % 5}")
    }.filter(p => p._1 != p._2).toDF("w", "l")
    val a = Preference.bradleyTerry(comp, "w", "l")
      .orderBy($"item").collect().toSeq
    val b = Preference.bradleyTerry(comp.repartition(13), "w", "l")
      .orderBy($"item").collect().toSeq
    assert(a == b)
  }

  test("majorityVote picks the modal label, ties to the smaller label") {
    val votes = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"),          // x wins 2:1
      (2L, "y"), (2L, "z"),                      // tie: y < z
      (3L, "z")
    ).toDF("item", "label")
    val got = Preference.majorityVote(votes, "item", "label")
      .orderBy($"item")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "x", 2L, 3L), (2L, "y", 1L, 2L), (3L, "z", 1L, 1L)))
  }

  test("weightedConsensus down-weights a contrarian annotator") {
    // items 1..4: annotators g1/g2 always agree (label "t"), spammer
    // always says "s". Round 1 majorities are all "t" (2:1), so the
    // spammer's reliability is 0 ppm and the revote is unanimous.
    val votes = (1L to 4L).flatMap(i => Seq(
      (i, "g1", "t"), (i, "g2", "t"), (i, "spam", "s"))).toDF("item", "ann", "lab")
    val got = Preference.weightedConsensus(votes, "item", "ann", "lab")
      .orderBy($"item")
      .select($"item", $"majority_label", $"final_label", $"conf_ppm")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == (1L to 4L).map(i => (i, "t", "t", 1000000L)))
  }

  test("weightedConsensus can flip an item the raw majority got wrong") {
    // 10 calibration items where g1/g2/g3 vote "t" and s1/s2 vote "s":
    // reliabilities g=1.0, s≈0.09 (they agree only on item 99).
    // item 99: s1, s2, g1 vote "s"-"s"-"t"... make raw majority "s"
    // (2:1) but weighted flips to "t" since spammers carry ~0 weight.
    val calib = (1L to 10L).flatMap(i => Seq(
      (i, "g1", "t"), (i, "g2", "t"), (i, "g3", "t"),
      (i, "s1", "s"), (i, "s2", "s")))
    val probe = Seq((99L, "s1", "s"), (99L, "s2", "s"), (99L, "g1", "t"))
    val votes = (calib ++ probe).toDF("item", "ann", "lab")
    val got = Preference.weightedConsensus(votes, "item", "ann", "lab")
      .filter($"item" === 99L)
      .select($"majority_label", $"final_label")
      .as[(String, String)].head()
    assert(got == ("s", "t"), got.toString)
  }

  test("agreementPanel: unanimous items give kappa = 1e6 exactly") {
    // two unanimous items per label; label marginals 50/50 so Pe = 0.5
    val votes = Seq(
      (1L, "x"), (1L, "x"), (1L, "x"), (2L, "x"), (2L, "x"), (2L, "x"),
      (3L, "y"), (3L, "y"), (3L, "y"), (4L, "y"), (4L, "y"), (4L, "y"),
      (9L, "z") // single-vote item: excluded from BOTH Po and Pe
    ).toDF("item", "lab")
    val got = Preference.agreementPanel(votes, "item", "lab")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 12L, 1000000L, 500000L, 1000000L)), got.toString)
  }

  test("agreementPanel matches a scalar mirror of the integer spelling") {
    val raw = (0 until 120).map(i => ((i % 10).toLong, s"l${(i * 7 + i / 10) % 3}"))
    val got = Preference.agreementPanel(raw.toDF("item", "lab"), "item", "lab")
      .as[(Long, Long, Long, Long, Long)].head()

    val byItem = raw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val elig = byItem.filter(_._2.size >= 2)
    val poI = elig.values.map { labs =>
      val n = labs.size.toLong
      val ap = labs.groupBy(identity).values
        .map(g => g.size.toLong * (g.size - 1)).sum
      (ap * 1000000L) / (n * (n - 1))
    }
    val poPpm = poI.sum / elig.size
    val marg = elig.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val v = marg.values.sum
    val pePpm = marg.values.map(s => { val p = s * 1000000L / v; p * p }).sum / 1000000L
    val kappa = (poPpm - pePpm) * 1000000L / (1000000L - pePpm)
    assert(got == ((elig.size.toLong, v, poPpm, pePpm, kappa)),
      s"got=$got expect=(${elig.size},$v,$poPpm,$pePpm,$kappa)")
  }

  test("agreementPanel: a single-label stream pins kappa to 0, not null/error") {
    // Pe = 1e6 exactly — kappa is 0/0-undefined; both engines pin 0
    val votes = (1L to 6L).flatMap(i => Seq((i, "t"), (i, "t"), (i, "t")))
      .toDF("item", "lab")
    val got = Preference.agreementPanel(votes, "item", "lab")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((6L, 18L, 1000000L, 1000000L, 0L)), got.toString)
  }

  test("orderBias counts second-presented wins per unordered pair") {
    val comp = Seq(
      ("a", "b", "b"), ("a", "b", "a"), ("b", "a", "a"),
      ("a", "c", "c"), ("a", "c", "c")
    ).toDF("f", "s", "w")
    val got = Preference.orderBias(comp, "f", "s", "w")
      .orderBy($"a", $"b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // (a,b): seconds are b,b,a; winners b,a,a -> second won rows 1 and 3
    assert(got == Seq(
      ("a", "b", 3L, 2L, 666666L),
      ("a", "c", 2L, 2L, 1000000L)))
  }

  test("rendezvousShard: adding shards only moves docs TO the new shards") {
    val docs = spark.range(2000).select($"id".as("doc_id"))
    val d = Corpus.rendezvousShard(
      Corpus.rendezvousShard(docs, "doc_id", 8, outCol = "s8"),
      "doc_id", 10, outCol = "s10").cache()
    val moved = d.filter($"s8" =!= $"s10")
    // HRW invariant: a changed argmax means a NEW candidate won
    assert(moved.filter($"s10" < 8).count() == 0)
    // expected movement is 2/10 of the corpus; allow a generous band
    val m = moved.count()
    assert(m > 200 && m < 600, s"moved $m of 2000")
    // stability beats hash-mod, which moves ~90% on 8 -> 10
    val hm = docs
      .withColumn("m8", pmod(TextFunctions.hash60($"doc_id".cast("string")), lit(8L)))
      .withColumn("m10", pmod(TextFunctions.hash60($"doc_id".cast("string")), lit(10L)))
      .filter($"m8" =!= $"m10").count()
    assert(m < hm / 2, s"HRW moved $m, hash-mod moved $hm")
    d.unpersist()
  }

  test("rendezvousShard portable and xxhash64 tiers are both balanced") {
    val docs = spark.range(4000).select($"id".as("doc_id"))
    for (portable <- Seq(true, false)) {
      val counts = Corpus.rendezvousShard(docs, "doc_id", 8, portable = portable)
        .groupBy($"shard").count().select($"count").as[Long].collect()
      assert(counts.length == 8)
      assert(counts.min > 300 && counts.max < 700,
        s"portable=$portable counts=${counts.mkString(",")}")
    }
  }
}
