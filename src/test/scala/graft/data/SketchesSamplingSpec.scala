package graft.data

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hllDistinct: estimate within sketch error bounds, exact integer state") {
    val n = 5000
    val df = (0 until n).map(i => ("g", s"user_$i")).toDF("g", "v")
    val r = Sketches.hllDistinct(df, Seq("g"), $"v", p = 8)
      .select($"hll_state", $"n_buckets", $"approx_distinct")
      .collect().head
    val est = r.getDouble(2)
    // p=8 => standard error ~6.5%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.26, s"estimate $est for $n distinct")
    assert(r.getLong(1) <= 256)
  }

  test("hllDistinct: duplicate-insensitive and partition-invariant") {
    val base = (0 until 1000).map(i => ("g", s"id_$i"))
    val dup = base ++ base ++ base.take(500)
    val a = Sketches.hllDistinct(base.toDF("g", "v"), Seq("g"), $"v")
      .select($"hll_state").as[Long].collect().head
    val b = Sketches.hllDistinct(dup.toDF("g", "v").repartition(17), Seq("g"), $"v")
      .select($"hll_state").as[Long].collect().head
    assert(a == b) // same distinct set -> identical sketch state
  }

  test("hllDistinct: nulls are ignored, matching COUNT(DISTINCT)") {
    val base = (0 until 200).map(i => ("g", s"id_$i"))
    val withNulls = base ++ Seq(("g", null), ("g", null), ("g", null))
    val a = Sketches.hllDistinct(base.toDF("g", "v"), Seq("g"), $"v")
      .select($"hll_state").as[Long].collect().head
    val b = Sketches.hllDistinct(withNulls.toDF("g", "v"), Seq("g"), $"v")
      .select($"hll_state").as[Long].collect().head
    assert(a == b) // a phantom null register would shift the state
  }

  test("hllDistinct: small-range linear counting kicks in and is near-exact") {
    val df = (0 until 30).map(i => ("g", s"k$i")).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), $"v")
      .select($"approx_distinct").as[Double].collect().head
    assert(math.abs(est - 30) < 4, s"linear-counting estimate $est for 30")
  }

  test("hashSplit: stable labels, correct proportions, hashSample subsets") {
    val ids = (0 until 10000).map(_.toLong).toDF("id")
    val split = Sampling.hashSplit($"id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val counts = ids.groupBy(split.as("s")).count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 8000.0) / 8000 < 0.05, counts.toString)
    assert(math.abs(counts("valid") - 1000.0) / 1000 < 0.15, counts.toString)
    assert(math.abs(counts("test") - 1000.0) / 1000 < 0.15, counts.toString)
    // repartitioning must not move any row between splits
    val l1 = ids.select($"id", split.as("s")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val l2 = ids.repartition(13).select($"id", split.as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(l1 == l2)
    // a 20% hash sample contains the 10% sample with the same salt
    val s10 = Sampling.hashSample(ids, $"id", 1000).as[Long].collect().toSet
    val s20 = Sampling.hashSample(ids, $"id", 2000).as[Long].collect().toSet
    assert(s10.subsetOf(s20))
    assert(math.abs(s10.size - 1000.0) / 1000 < 0.15, s10.size.toString)
    // different salt decorrelates: overlap near 10% of 10%, not 100%
    val other = Sampling.hashSample(ids, $"id", 1000, salt = "x").as[Long].collect().toSet
    assert((s10 intersect other).size < 400)
  }

  test("fixedHistogram: clamped bins, exact counts; quantile within one bin width") {
    val vals = (1 to 10000).map(i => ("g", i.toDouble)) ++
      Seq(("g", -5.0), ("g", 20000.0)) // out-of-range clamps, not drops
    val df = vals.toDF("g", "v")
    val hist = Sketches.fixedHistogram(df, Seq("g"), $"v", lo = 0.0, hi = 10000.0, nBins = 10)
    val counts = hist.select($"bin", $"bin_n").as[(Long, Long)].collect().toMap
    assert(counts.values.sum == 10002L)
    assert(counts(0L) == 1000L) // 1..999 plus the clamped -5
    assert(counts(9L) == 1002L) // 9000..9999 plus clamped 10000 and 20000
    val q = Sketches.histogramQuantile(hist, Seq("g"), 0.0, 10000.0, 10, p = 0.5)
      .select($"q_approx").as[Double].collect().head
    // true median of 1..10000 (+2 clamped outliers) ~ 5000; bin width 1000
    assert(math.abs(q - 5000.0) <= 1000.0, q.toString)
  }

  test("count-min: estimate >= exact, exact for dominant keys, fixed state") {
    // zipf-ish: key k appears 1000/k times
    val data = (1 to 50).flatMap(k => Seq.fill(1000 / k)(s"key$k")).map(Tuple1(_))
      .toDF("k")
    val counters = Sketches.cmsCounters(data, $"k", depth = 4, width = 256)
    assert(counters.count() <= 4 * 256) // bounded state
    val probes = Seq("key1", "key7", "key50", "missing").toDF("k")
    val est = Sketches.cmsEstimate(counters, probes, $"k", depth = 4, width = 256)
      .select($"k", $"cms_est").as[(String, Long)].collect().toMap
    val exact = Map("key1" -> 1000L, "key7" -> 142L, "key50" -> 20L, "missing" -> 0L)
    // count-min bound: never under-estimates
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k: ${est(k)} < $n") }
    // with 50 keys in 4x256 slots, collisions are rare: within 5% slack
    exact.foreach { case (k, n) => assert(est(k) <= n + 50, s"$k: ${est(k)} >> $n") }
  }

  test("mixtureSample applies per-group rates deterministically") {
    val df = (0 until 3000).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val kept = Sampling.mixtureSample(df, $"g", $"id",
      Map("g0" -> 0.9, "g1" -> 0.1), defaultRate = 0.5)
    val counts = kept.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("g0") - 900.0) / 900 < 0.1, counts.toString)
    assert(math.abs(counts("g1") - 100.0) / 100 < 0.4, counts.toString)
    assert(math.abs(counts("g2") - 500.0) / 500 < 0.15, counts.toString)
    // deterministic: same rows kept on any partitioning
    val k2 = Sampling.mixtureSample(df.repartition(11), $"g", $"id",
      Map("g0" -> 0.9, "g1" -> 0.1), defaultRate = 0.5)
    assert(kept.select($"id").as[Long].collect().toSet ==
      k2.select($"id").as[Long].collect().toSet)
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(df, $"g", $"id", Map("g0" -> 1.5), 0.5)
    }
  }

  test("weightedSample: exact size, deterministic, weight-proportional, positive-only") {
    val rows = (1L to 200L).map(i => (i, if (i <= 5) 10000.0 else 1.0))
      .toDF("id", "w")
    val pick = Sampling.weightedSample(rows, col("id"), col("w"), k = 20)
      .select($"id").as[Long].collect().toSet
    assert(pick.size === 20)
    // the 5 rows carrying 10000x weight are (overwhelmingly) all sampled:
    // P(miss) per heavy row < (1/10000-ish)^... — deterministic given the salt
    assert((1L to 5L).toSet.subsetOf(pick), pick.toString)
    // same inputs + salt -> same sample; different salt -> different sample
    val again = Sampling.weightedSample(rows, col("id"), col("w"), k = 20)
      .select($"id").as[Long].collect().toSet
    assert(again === pick)
    val other = Sampling.weightedSample(rows, col("id"), col("w"), k = 20,
        salt = "other").select($"id").as[Long].collect().toSet
    assert(other !== pick)
    // non-positive weights are never sampled, even with k > candidates
    val mixed = Seq((1L, 1.0), (2L, 0.0), (3L, -4.0), (4L, 2.0)).toDF("id", "w")
    val kept = Sampling.weightedSample(mixed, col("id"), col("w"), k = 10)
      .select($"id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L))
  }

  test("weightedSampleByGroup: k per stratum, independent of other strata") {
    val rows = (1L to 100L).map(i => (if (i <= 80) "big" else "small", i, 1.0 + (i % 7)))
      .toDF("src", "id", "w")
    val got = Sampling.weightedSampleByGroup(rows, Seq("src"), col("id"),
        col("w"), k = 5)
      .select($"src", $"id").as[(String, Long)].collect()
    assert(got.count(_._1 == "big") === 5)
    assert(got.count(_._1 == "small") === 5)
    // stratum independence: the big stratum alone yields the same 5 ids
    val solo = Sampling.weightedSampleByGroup(rows.filter($"src" === "big"),
        Seq("src"), col("id"), col("w"), k = 5)
      .select($"id").as[Long].collect().toSet
    assert(solo === got.filter(_._1 == "big").map(_._2).toSet)
    // a stratum smaller than k keeps everything it has
    val tiny = Sampling.weightedSampleByGroup(rows.filter($"id" > 98L),
        Seq("src"), col("id"), col("w"), k = 5)
      .select($"id").as[Long].collect().toSet
    assert(tiny === Set(99L, 100L))
  }

  test("hashSplit rejects fractions that don't sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(lit(1L), Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("mixturePlan: need/take/shortfall/rate bookkeeping on a hand-checked recipe") {
    val docs = Seq(
      ("web", 100L), ("web", 300L),   // avail 400
      ("wiki", 50L), ("wiki", 50L),   // avail 100
      ("code", 1000L)                 // avail 1000, no weight -> 0
    ).toDF("source", "n")
    val plan = Sampling.mixturePlan(docs, col("source"), col("n"),
        Map("web" -> 500000L, "wiki" -> 500000L), budgetTokens = 600L)
      .select(col("source"), col("need_tokens"), col("take_tokens"),
        col("shortfall_tokens"), col("rate_ppm"), col("epochs"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // each side needs 300; web has 400 (take 300, rate 750000, 1 epoch),
    // wiki has 100 (take 100, shortfall 200, rate 1000000, 3 epochs)
    assert(plan("web") === (("web", 300L, 300L, 0L, 750000L, 1L)))
    assert(plan("wiki") === (("wiki", 300L, 100L, 200L, 1000000L, 3L)))
    assert(plan("code") === (("code", 0L, 0L, 0L, 0L, 0L)))
  }

  test("mixturePlan: a 100 TB-token budget does not overflow the need arithmetic") {
    val docs = Seq(("web", 1000L)).toDF("source", "n")
    // 5e13-token budget x 999999 ppm: w*B ~ 5e19 would overflow a long;
    // the split spelling must still produce floor(w*B/1e6) exactly
    val b = 50000000000000L
    val w = 999999L
    val need = Sampling.mixturePlan(docs, col("source"), col("n"),
        Map("web" -> w), budgetTokens = b)
      .select(col("need_tokens")).as[Long].head()
    val expected = {
      val bi = (BigInt(w) * BigInt(b)) / BigInt(1000000)
      bi.toLong
    }
    assert(need === expected)
  }

  test("ecdfNormalize: exact ppm ranks, in-bin ties share a rank, top bin hits 1e6") {
    val df = Seq(1.0, 2.0, 2.2, 5.0, 9.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "score")
    val got = Sketches.ecdfNormalize(df, $"score", lo = 0.0, hi = 10.0,
        nBins = 10)
      .select($"id", $"ecdf_ppm").as[(Long, Long)].collect().toMap
    // bins of width 1: score 1.0->bin1 (cum 1/5), 2.0 & 2.2 ->bin2 (cum 3/5,
    // tie shares the rank), 5.0->bin5 (4/5), 9.0->bin9 (5/5)
    assert(got === Map(0L -> 200000L, 1L -> 600000L, 2L -> 600000L,
      3L -> 800000L, 4L -> 1000000L))
  }

  test("ecdfNormalize clamps out-of-range values into the edge bins") {
    val df = Seq((1L, -5.0), (2L, 50.0), (3L, 5.0)).toDF("id", "score")
    val got = Sketches.ecdfNormalize(df, $"score", 0.0, 10.0, 10)
      .select($"id", $"ecdf_ppm").as[(Long, Long)].collect().toMap
    assert(got(1L) === 333333L) // below lo -> bin 0, rank 1/3
    assert(got(2L) === 1000000L) // above hi -> top bin
  }

  test("hllSketch registers: union(parts) is bit-identical to sketch(whole); idempotent") {
    val rows = (0 until 2000).map(i => (s"part${i % 4}", s"user_${i % 700}"))
      .toDF("part", "v")
    val parts = Sketches.hllSketch(rows, Seq("part"), $"v")
    val whole = Sketches.hllSketch(rows, Seq.empty, $"v")
      .select($"registers").as[Seq[Int]].head()
    val union = Sketches.hllUnion(parts, Seq.empty, $"registers")
      .select($"registers").as[Seq[Int]].head()
    assert(union === whole)
    // idempotent: unioning a part in twice changes nothing
    val doubled = Sketches.hllUnion(
        parts.union(parts.limit(1)), Seq.empty, $"registers")
      .select($"registers").as[Seq[Int]].head()
    assert(doubled === whole)
    // the register-derived state matches hllDistinct's pre-summed state
    val stateViaRegisters = Sketches.hllSketch(rows, Seq.empty, $"v")
      .select(Sketches.hllStateOf($"registers", 8)).as[Long].head()
    val stateDirect = Sketches.hllDistinct(rows, Seq.empty, $"v")
      .select($"hll_state").as[Long].head()
    assert(stateViaRegisters === stateDirect)
    // and the estimate bridge agrees with hllDistinct's estimate
    val estA = Sketches.hllSketch(rows, Seq.empty, $"v")
      .select(Sketches.hllEstimateFromRegisters($"registers", 8))
      .as[Double].head()
    val estB = Sketches.hllDistinct(rows, Seq.empty, $"v")
      .select($"approx_distinct").as[Double].head()
    assert(estA === estB)
  }

  test("clusterSafeSplit: a near-dup cluster never straddles the boundary") {
    // 3 clusters of paraphrases + 4 singletons
    val docs = (1L to 10L).map(i => (i, s"doc $i")).toDF("id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L), (6L, 7L))
      .toDF("id_a", "id_b")
    val got = Sampling.clusterSafeSplit(docs, "id", pairs,
        Seq("train" -> 0.5, "test" -> 0.5), salt = "x")
      .select($"id", $"cluster", $"split")
      .as[(Long, Option[Long], String)].collect()
    // every clustered doc shares its cluster-mates' split
    val byCluster = got.filter(_._2.isDefined).groupBy(_._2.get)
    assert(byCluster.size === 3)
    byCluster.foreach { case (c, rows) =>
      assert(rows.map(_._3).distinct.length === 1, s"cluster $c straddles") }
    // singletons (8, 9, 10) carry null cluster and still get a split
    assert(got.filter(_._2.isEmpty).map(_._1).toSet === Set(8L, 9L, 10L))
    assert(got.forall(r => r._3 == "train" || r._3 == "test"))
  }

  test("clusterSafeSplit: plain hashSplit DOES leak on the same data (the bug this fixes)") {
    // find a pair whose ids hash to different splits, then show
    // clusterSafeSplit sends both to one side
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("id", "text")
    val naive = docs.withColumn("split",
        Sampling.hashSplit($"id", Seq("train" -> 0.5, "test" -> 0.5), "x"))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val leaky = (1L to 39L).find(i => naive(i) != naive(i + 1))
    assert(leaky.isDefined, "expected at least one adjacent-id split difference")
    val (a, b) = (leaky.get, leaky.get + 1)
    val fixed = Sampling.clusterSafeSplit(docs, "id",
        Seq((a, b)).toDF("id_a", "id_b"),
        Seq("train" -> 0.5, "test" -> 0.5), salt = "x")
      .filter($"id".isin(a, b)).select($"split").as[String].collect()
    assert(fixed.distinct.length === 1)
  }

  test("proportionalAllocation: Hamilton quotas sum to k, hand case") {
    val sizes = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 5L))
      .toDF("source", "n")
    val got = Sampling.proportionalAllocation(sizes, Seq("source"), 7L)
      .select(col("source"), col("quota")).as[(String, Long)].collect().toMap
    // shares: 3.5, 2.1, 1.05, .35 -> floors 3,2,1,0 (sum 6); largest
    // remainder: a (.5) gets the leftover slot
    assert(got === Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 0L))
    assert(got.values.sum === 7L)
  }

  test("proportionalAllocation: zero total allocates nothing") {
    // all-empty groups: without the scaled>0 gate the largest-remainder
    // rule would hand +1 slots to the first k groups alphabetically
    val sizes = Seq(("a", 0L), ("b", 0L), ("c", 0L)).toDF("source", "n")
    val got = Sampling.proportionalAllocation(sizes, Seq("source"), 2L)
      .select(col("source"), col("quota")).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
    // mixed: an empty group never takes a remainder slot
    val mixed = Seq(("a", 3L), ("b", 0L), ("c", 4L)).toDF("source", "n")
    val got2 = Sampling.proportionalAllocation(mixed, Seq("source"), 5L)
      .select(col("source"), col("quota")).as[(String, Long)].collect().toMap
    assert(got2("b") === 0L)
    assert(got2.values.sum === 5L)
  }

  test("proportionalAllocation: temperature 0.5 flattens toward small groups") {
    val sizes = Seq(("big", 10000L), ("small", 100L)).toDF("source", "n")
    def quotaOf(temp: Boolean) =
      Sampling.proportionalAllocation(sizes, Seq("source"), 100L,
          temperatureHalf = temp)
        .select(col("source"), col("quota")).as[(String, Long)].collect().toMap
    val flat = quotaOf(false); val sq = quotaOf(true)
    assert(flat("small") === 1L)          // 100/10100 share
    assert(sq("small") === 9L)            // sqrt: 10/110 share
    assert(flat.values.sum === 100L && sq.values.sum === 100L)
  }

  test("weightedSampleAllocated: fills each quota, keeps what exists") {
    val rows = (1 to 40).map(i => (if (i <= 30) "x" else "y", i.toLong, i.toLong))
      .toDF("source", "id", "w")
    val quotas = Seq(("x", 5L), ("y", 20L)).toDF("source", "quota")
    val got = Sampling.weightedSampleAllocated(rows, Seq("source"),
        col("id"), col("w"), quotas)
      .groupBy(col("source")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("x" -> 5L, "y" -> 10L)) // y has only 10 rows
  }

  test("weightedSampleAllocated with uniform quota == weightedSampleByGroup") {
    val rows = (1 to 60).map(i => (s"g${i % 3}", i.toLong, (i % 7 + 1).toLong))
      .toDF("source", "id", "w")
    val quotas = Seq(("g0", 4L), ("g1", 4L), ("g2", 4L)).toDF("source", "quota")
    val a = Sampling.weightedSampleAllocated(rows, Seq("source"),
        col("id"), col("w"), quotas)
      .select(col("source"), col("id")).as[(String, Long)].collect().toSet
    val b = Sampling.weightedSampleByGroup(rows, Seq("source"),
        col("id"), col("w"), k = 4)
      .select(col("source"), col("id")).as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("ecdfNormalizeByGroup: per-group ranks; top-of-group hits 1e6") {
    val rows = Seq(
      ("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0), ("a", 4L, 40.0),
      ("b", 5L, 35.0), ("b", 6L, 35.0))
      .toDF("g", "id", "v")
    val got = Sketches.ecdfNormalizeByGroup(rows, Seq("g"), col("v"),
        lo = 0.0, hi = 50.0, nBins = 50)
      .select(col("id"), col("ecdf_ppm")).as[(Long, Long)].collect().toMap
    // group a: ranks 1..4 of 4 -> 250000, 500000, 750000, 1000000
    assert(got(1L) === 250000L && got(2L) === 500000L)
    assert(got(3L) === 750000L && got(4L) === 1000000L)
    // group b: tied bin -> both share the full-group rank 1e6
    assert(got(5L) === 1000000L && got(6L) === 1000000L)
  }

  test("ecdfNormalizeByGroup matches the global form on one group") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(300)(i => (i.toLong, rnd.nextDouble() * 100.0))
      .toDF("id", "v").withColumn("g", lit("only"))
    val grouped = Sketches.ecdfNormalizeByGroup(rows, Seq("g"), col("v"),
        0.0, 100.0, 20)
      .select(col("id"), col("ecdf_ppm")).as[(Long, Long)].collect().toMap
    val global = Sketches.ecdfNormalize(rows, col("v"), 0.0, 100.0, 20)
      .select(col("id"), col("ecdf_ppm")).as[(Long, Long)].collect().toMap
    assert(grouped === global)
  }

  test("pearsonExact: perfect, inverse, and random-reference correlations") {
    val rnd = new scala.util.Random(8)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, 3L * i + 7L, 100L - i.toLong, rnd.nextInt(50).toLong))
      .toDF("x", "lin", "inv", "z")
    val got = Sketches.pearsonExact(rows, Seq(
        ("lin", col("x"), col("lin")), ("inv", col("x"), col("inv")),
        ("rnd", col("x"), col("z"))))
      .select(col("pair"), col("corr")).as[(String, Double)].collect().toMap
    assert(got("lin") === 1.0)
    assert(got("inv") === -1.0)
    // scalar reference on the random pair
    val xs = (0 until 200).map(_.toLong)
    val zs = { val r2 = new scala.util.Random(8)
      Seq.fill(200)(r2.nextInt(50).toLong) }
    val n = 200.0
    val sx = xs.sum.toDouble; val sz = zs.sum.toDouble
    val sxz = xs.zip(zs).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val szz = zs.map(a => a * a).sum.toDouble
    val want = (n * sxz - sx * sz) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * szz - sz * sz))
    assert(math.abs(got("rnd") - math.rint(want * 1e6) / 1e6) <= 1e-6)
  }

  test("pearsonExact: a zero-variance side yields null, not an abort") {
    val rows = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "c")
    val got = Sketches.pearsonExact(rows, Seq(("xc", col("x"), col("c"))))
      .select(col("corr")).collect().head
    assert(got.isNullAt(0))
  }

  test("materializeRates: whole epochs exact, fractional hash-deterministic, zero drops") {
    val docs = (0 until 900).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    val out = Sampling.materializeRates(docs, col("src"), col("id"),
      Map("s0" -> 3000000L, "s1" -> 1500000L, "s2" -> 0L))
    val rows = out.select(col("id"), col("src"), col("epoch"))
      .as[(Long, String, Long)].collect()
    // s0 at exactly 3 epochs: every doc 3 times, epochs 0,1,2
    val s0 = rows.filter(_._2 == "s0").groupBy(_._1).view.mapValues(_.map(_._3).sorted)
    assert(s0.size == 300 && s0.values.forall(_.sameElements(Seq(0L, 1L, 2L))))
    // s2 at rate 0: gone entirely
    assert(!rows.exists(_._2 == "s2"))
    // s1 at 1.5 epochs: every doc >= once; extra copies ~half, content-addressed
    val s1 = rows.filter(_._2 == "s1").groupBy(_._1).view.mapValues(_.size).toMap
    assert(s1.size == 300 && s1.values.forall(c => c == 1 || c == 2))
    val extras = s1.values.count(_ == 2)
    assert(extras > 100 && extras < 200, s"$extras of 300 got the extra pass")
    // determinism: identical output under a different partitioning
    val again = Sampling.materializeRates(docs.repartition(13), col("src"),
        col("id"), Map("s0" -> 3000000L, "s1" -> 1500000L, "s2" -> 0L))
      .select(col("id"), col("src"), col("epoch"))
      .as[(Long, String, Long)].collect()
    assert(rows.sorted.sameElements(again.sorted))
    // pure down-sampling: a single epoch-0 Bernoulli keep at ~the rate
    val down = Sampling.materializeRates(docs, col("src"), col("id"),
      Map.empty, defaultPpm = 400000L)
    val downN = down.count()
    assert(downN > 900 * 0.3 && downN < 900 * 0.5, s"kept $downN of 900")
    assert(down.select(max(col("epoch"))).as[Long].head() == 0L)
  }

  test("selectToBudget scale path: ECDF score-threshold lands within one bin of exact") {
    // the documented two-pass spelling for when a per-group sort is
    // unaffordable: per-group ECDF of the order score -> keep everything
    // above the rank threshold implied by the budget share
    val rnd = new scala.util.Random(21)
    val docs = Seq.tabulate(2000)(i =>
      (i.toLong, s"g${i % 2}", (rnd.nextInt(1000) + 1).toLong))
      .toDF("id", "g", "score")
      .withColumn("tok", col("score")) // tokens proportional to score
    val budget = 50000L
    val exact = Sampling.selectToBudget(docs, Seq("g"),
        Seq(col("score").desc, col("id").asc), col("tok"), budget)
      .groupBy(col("g")).agg(sum(col("tok")).as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // two-pass path: ECDF rank per group, then keep the top slice whose
    // expected token mass reaches the budget (score-proportional tokens
    // -> threshold from the per-group token ECDF over the score column)
    val ranked = Sketches.ecdfNormalizeByGroup(docs, Seq("g"), col("score"),
      lo = 0.0, hi = 1001.0, nBins = 200)
    // per group: find the smallest ecdf cutoff whose tail token mass >= budget
    val cutoffs = ranked.groupBy(col("g"), col("ecdf_ppm"))
      .agg(sum(col("tok")).as("t"))
      .withColumn("tail", sum(col("t")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("ecdf_ppm").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("tail") >= budget)
      .groupBy(col("g")).agg(max(col("ecdf_ppm")).as("cut"))
    val approx = ranked.join(cutoffs, "g")
      .filter(col("ecdf_ppm") >= col("cut"))
      .groupBy(col("g")).agg(sum(col("tok")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // within one bin's token mass of the exact selection: with 200 bins
    // over ~1000 score values and ~500 tokens/doc avg, a generous band
    exact.foreach { case (g, (t, _)) =>
      val a = approx(g)
      assert(a >= budget, s"$g: approx $a under budget")
      assert(math.abs(a - t) <= 30000L, s"$g: approx $a vs exact $t")
    }
  }

  test("selectToBudget: scalar walk parity, straddler kept, zero budget empty") {
    val rnd = new scala.util.Random(9)
    val docs = Seq.tabulate(300)(i =>
      (i.toLong, s"g${i % 4}", 10L + rnd.nextInt(90)))
      .toDF("id", "g", "tok")
    val kept = Sampling.selectToBudget(docs.repartition(7), Seq("g"),
        Seq(col("tok").desc, col("id").asc), col("tok"), budgetTokens = 500L)
      .select(col("id")).as[Long].collect().toSet
    // scalar reference: per group, sort (tok desc, id asc), keep while
    // exclusive prefix < budget
    val byG = docs.as[(Long, String, Long)].collect().groupBy(_._2)
    val want = byG.values.flatMap { g =>
      val sorted = g.sortBy(r => (-r._3, r._1))
      var pre = 0L
      sorted.takeWhile { r => val ok = pre < 500L; pre += r._3; ok }.map(_._1)
    }.toSet
    assert(kept == want)
    // every group lands in [budget, budget + max doc) tokens
    byG.foreach { case (gName, g) =>
      val tot = g.filter(r => kept(r._1)).map(_._3).sum
      val mx = g.map(_._3).max
      assert(tot >= 500L && tot < 500L + mx, s"$gName: $tot")
    }
    val none = Sampling.selectToBudget(docs, Seq("g"),
      Seq(col("tok").desc), col("tok"), budgetTokens = 0L)
    assert(none.count() == 0L)
  }
}
