package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Integer micro-unit PageRank: equality against an independent
 * driver-side reference on a hand-built graph, partition-order
 * invariance (the point of exact longs), co-occurrence edge
 * construction, and conservation/ordering sanity.
 */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line scalar reference of the same integer recurrence. */
  private def refPageRank(
      edges: Seq[(String, String)], iters: Int,
      redistribute: Boolean = false): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> 1000000000L / n).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / deg(s) }.sum
      }
      val dang =
        if (redistribute) nodes.filterNot(deg.contains).map(r).sum / n else 0L
      r = nodes.map(nd =>
        nd -> (150000000L / n +
          17L * (contrib.getOrElse(nd, 0L) + dang) / 20L)).toMap
    }
    r
  }

  private val toyEdges = Seq(
    ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
    ("b", "c"), ("c", "b"), ("d", "a"), ("a", "d"),
    ("e", "a"), ("a", "e"), ("d", "e"), ("e", "d"))

  test("pageRank matches the scalar reference exactly (3 and 7 iters)") {
    val df = toyEdges.toDF("s", "d")
    for (iters <- Seq(3, 7)) {
      val got = Graph.pageRank(df, "s", "d", iters)
        .select(col("node"), col("rank_micro"))
        .as[(String, Long)].collect().toMap
      assert(got === refPageRank(toyEdges, iters), s"iters=$iters")
    }
  }

  /** Scalar reference of the personalized (seed-teleport) recurrence. */
  private def refPersonalized(
      edges: Seq[(String, String)], seeds: Set[String],
      iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    val inGraph = nodes.filter(seeds).toSet
    val ns = inGraph.size.toLong
    var r = nodes.map(nd =>
      nd -> (if (inGraph(nd)) 1000000000L / ns else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (d, in) =>
        d -> in.map { case (s, _) => r(s) / deg(s) }.sum
      }
      r = nodes.map(nd =>
        nd -> ((if (inGraph(nd)) 150000000L / ns else 0L) +
          17L * contrib.getOrElse(nd, 0L) / 20L)).toMap
    }
    r
  }

  test("personalizedPageRank matches the scalar reference exactly") {
    val df = toyEdges.toDF("s", "d")
    for (iters <- Seq(1, 3, 5)) {
      val got = Graph.personalizedPageRank(df, "s", "d",
          Seq("a", "d").toDF("n"), "n", iters)
        .select(col("node"), col("rank_micro"))
        .as[(String, Long)].collect().toMap
      assert(got === refPersonalized(toyEdges, Set("a", "d"), iters),
        s"iters=$iters")
    }
  }

  test("personalizedPageRank: unreachable-from-seeds scores exactly 0") {
    // two disconnected cliques; seed only in the first — the second
    // interlinks heavily (global PageRank would reward it) but gets no
    // trust mass at all
    val e = Seq(("a", "b"), ("b", "a"),
      ("x", "y"), ("y", "z"), ("z", "x"), ("x", "z"), ("z", "y"), ("y", "x"))
    val got = Graph.personalizedPageRank(e.toDF("s", "d"), "s", "d",
        Seq("a").toDF("n"), "n", iters = 4)
      .select(col("node"), col("rank_micro"))
      .as[(String, Long)].collect().toMap
    assert(got("x") === 0L && got("y") === 0L && got("z") === 0L)
    assert(got("a") > 0L && got("b") > 0L)
  }

  test("personalizedPageRank: seeds absent from the graph are ignored") {
    val got = Graph.personalizedPageRank(toyEdges.toDF("s", "d"), "s", "d",
        Seq("a", "ghost").toDF("n"), "n", iters = 2)
      .select(col("node"), col("rank_micro"))
      .as[(String, Long)].collect().toMap
    assert(got === refPersonalized(toyEdges, Set("a"), 2))
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(toyEdges.toDF("s", "d"), "s", "d",
        Seq("ghost").toDF("n"), "n", iters = 1)
    }
  }

  test("pageRank is invariant to input partitioning (exact longs)") {
    val a = Graph.pageRank(toyEdges.toDF("s", "d"), "s", "d", 3)
      .select(col("node"), col("rank_micro")).as[(String, Long)]
      .collect().toMap
    val b = Graph.pageRank(toyEdges.toDF("s", "d").repartition(7), "s", "d", 3)
      .select(col("node"), col("rank_micro")).as[(String, Long)]
      .collect().toMap
    assert(a === b)
  }

  test("hub outranks leaves; mass is conserved up to floor loss") {
    val got = Graph.pageRank(toyEdges.toDF("s", "d"), "s", "d", 5)
      .select(col("node"), col("rank_micro")).as[(String, Long)]
      .collect().toMap
    assert(got("a") > got("b") && got("a") > got("d"),
      s"hub a should dominate: $got") // a has degree 4, others 2
    val total = got.values.sum
    // symmetric graph: no dangling leak; only integer floor truncation
    // (bounded by one micro per edge/node per iteration)
    assert(total <= 1000000000L)
    assert(total > 1000000000L - 1000L, s"floor loss too large: $total")
  }

  // directed graph with two dangling sinks: d and f have no out-edges
  private val directedEdges = Seq(
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
    ("c", "a"), ("c", "d"), ("e", "a"), ("e", "f"))

  test("redistributeDangling matches the scalar reference exactly") {
    val df = directedEdges.toDF("s", "d")
    for (iters <- Seq(1, 3, 7)) {
      val got = Graph.pageRank(df, "s", "d", iters, redistributeDangling = true)
        .select(col("node"), col("rank_micro"))
        .as[(String, Long)].collect().toMap
      assert(got === refPageRank(directedEdges, iters, redistribute = true),
        s"iters=$iters")
    }
  }

  test("redistributeDangling conserves mass; the leaking default does not") {
    val df = directedEdges.toDF("s", "d")
    val n = 6L // a..f
    val nE = directedEdges.size.toLong
    val iters = 5
    val kept = Graph.pageRank(df, "s", "d", iters, redistributeDangling = true)
      .select(col("rank_micro")).as[Long].collect().sum
    val leaked = Graph.pageRank(df, "s", "d", iters)
      .select(col("rank_micro")).as[Long].collect().sum
    // conservation up to deterministic floor truncation: each iteration
    // floors away < |E| micros (per-edge contribution division) + 3N
    // (base, damping, D div N), nothing else
    assert(kept <= 1000000000L)
    assert(kept > 1000000000L - (nE + 3 * n) * iters,
      s"floor loss too large: $kept")
    // the leaking default drops ~0.85 of the dangling mass per
    // iteration — orders beyond floor noise on this graph
    assert(leaked < kept - 50000000L,
      s"leak should dwarf floor loss: leaked=$leaked kept=$kept")
  }

  test("redistributeDangling is a no-op on graphs with no dangling nodes") {
    val df = toyEdges.toDF("s", "d") // symmetric: every node has out-edges
    val a = Graph.pageRank(df, "s", "d", 3)
      .select(col("node"), col("rank_micro")).as[(String, Long)].collect().toMap
    val b = Graph.pageRank(df, "s", "d", 3, redistributeDangling = true)
      .select(col("node"), col("rank_micro")).as[(String, Long)].collect().toMap
    assert(a === b)
  }

  test("coOccurrenceEdges: distinct within-group pairs, both directions") {
    val pairs = Seq((1L, "x"), (1L, "y"), (1L, "y"), (2L, "y"), (2L, "z"),
      (3L, "x")).toDF("g", "m")
    val got = Graph.coOccurrenceEdges(pairs, "g", "m")
      .as[(String, String)].collect().toSet
    assert(got === Set(("x", "y"), ("y", "x"), ("y", "z"), ("z", "y")))
  }

  test("pageRank with zero iterations returns the uniform init") {
    val got = Graph.pageRank(toyEdges.toDF("s", "d"), "s", "d", 0)
      .select(col("node"), col("rank_micro")).as[(String, Long)]
      .collect().toMap
    assert(got.values.toSet === Set(1000000000L / 5))
  }

  /** Straight-line scalar reference of the same HITS integer
   * recurrence (L1-normalized half-steps, floor division). */
  private def refHits(edges: Seq[(String, String)],
      iters: Int): Map[String, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    var hub = nodes.map(_ -> 1000000000L / n).toMap
    var auth = nodes.map(_ -> 0L).toMap
    def half(scores: Map[String, Long], out: Boolean): Map[String, Long] = {
      val raw = nodes.map { nd =>
        val in = if (out) e.filter(_._2 == nd).map(_._1)
                 else e.filter(_._1 == nd).map(_._2)
        nd -> in.map(scores).sum
      }.toMap
      val s = raw.values.sum
      nodes.map(nd =>
        nd -> (if (s == 0L || raw(nd) == 0L) 0L
               else raw(nd) * 1000000000L / s)).toMap
    }
    for (_ <- 1 to iters) {
      auth = half(hub, out = true)
      hub = half(auth, out = false)
    }
    nodes.map(nd => nd -> ((auth(nd), hub(nd)))).toMap
  }

  // directed: a,b both point at c (authority); d points at a,b,c (hub);
  // c points nowhere (pure authority, hub 0)
  private val hitsEdges = Seq(
    ("a", "c"), ("b", "c"), ("d", "a"), ("d", "b"), ("d", "c"))

  test("hits matches the scalar reference exactly (1, 2, 3 iters)") {
    val df = hitsEdges.toDF("s", "d")
    for (iters <- Seq(1, 2, 3)) {
      val got = Graph.hits(df, "s", "d", iters)
        .select(col("node"), col("auth_micro"), col("hub_micro"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === refHits(hitsEdges, iters), s"iters=$iters")
    }
  }

  test("hits: pure authority has hub 0; the fan-out node is the top hub") {
    val got = Graph.hits(hitsEdges.toDF("s", "d"), "s", "d", 2)
      .select(col("node"), col("auth_micro"), col("hub_micro"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("c")._2 === 0L)                       // no out-edges
    assert(got("c")._1 === got.values.map(_._1).max) // top authority
    assert(got("d")._2 === got.values.map(_._2).max) // top hub
    assert(got("d")._1 === 0L)                       // nothing points at d
  }

  test("hits is invariant to input partitioning (exact longs)") {
    val a = Graph.hits(hitsEdges.toDF("s", "d"), "s", "d", 2)
      .select(col("node"), col("auth_micro"), col("hub_micro"))
      .as[(String, Long, Long)].collect().toSet
    val b = Graph.hits(hitsEdges.toDF("s", "d").repartition(7), "s", "d", 2)
      .select(col("node"), col("auth_micro"), col("hub_micro"))
      .as[(String, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("hits normalization: each score table sums to ~1e9 (floor loss < N)") {
    val rows = Graph.hits(hitsEdges.toDF("s", "d"), "s", "d", 3)
      .select(col("auth_micro"), col("hub_micro"))
      .as[(Long, Long)].collect()
    val n = rows.length
    val (sa, sh) = (rows.map(_._1).sum, rows.map(_._2).sum)
    assert(sa > 1000000000L - n && sa <= 1000000000L, s"auth sum $sa")
    assert(sh > 1000000000L - n && sh <= 1000000000L, s"hub sum $sh")
  }

  test("weighted pageRank: uniform weights == unweighted, bit for bit") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val ew = e.withColumn("w", lit(7L))
    val plain = Graph.pageRank(e, "src", "dst", iters = 3)
      .select(col("node"), col("rank_micro")).as[(Long, Long)].collect().toSet
    val weighted = Graph.pageRank(ew, "src", "dst", iters = 3,
        weightCol = Some("w"))
      .select(col("node"), col("rank_micro")).as[(Long, Long)].collect().toSet
    assert(weighted === plain)
  }

  test("weighted pageRank: mass splits by weight; scalar reference") {
    // 1 -> 2 (w3), 1 -> 3 (w1); 2 -> 1, 3 -> 1 (w1 each)
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRank(e, "src", "dst", iters = 2,
        weightCol = Some("w"))
      .select(col("node"), col("rank_micro")).as[(Long, Long)].collect().toMap
    // scalar replay of the integer recurrence
    val n = 3L
    val init = 1000000000L / n; val base = 150000000L / n
    var r = Map(1L -> init, 2L -> init, 3L -> init)
    for (_ <- 1 to 2) {
      val c = Map(
        2L -> (r(1L) * 3L) / 4L,
        3L -> (r(1L) * 1L) / 4L,
        1L -> ((r(2L) * 1L) / 1L + (r(3L) * 1L) / 1L))
      r = Seq(1L, 2L, 3L).map(k =>
        k -> (base + (17L * c.getOrElse(k, 0L)) / 20L)).toMap
    }
    assert(got === r)
  }

  test("weighted pageRank: parallel edges pre-sum; non-positive drop") {
    val a = Seq((1L, 2L, 2L), (1L, 2L, 1L), (2L, 1L, 1L), (1L, 3L, 0L))
      .toDF("src", "dst", "w")
    val b = Seq((1L, 2L, 3L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRank(df, "src", "dst", iters = 2, weightCol = Some("w"))
        .select(col("node"), col("rank_micro")).as[(Long, Long)].collect().toSet
    assert(run(a) === run(b))
  }

  /** Scalar reference of the synchronous min-tie-break LPA recurrence. */
  private def refLpa(edges: Seq[(String, String)],
      iters: Int): Map[String, String] = {
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val nbrs = sym.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).distinct }
    var lab: Map[String, String] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val prev = lab
      lab = nbrs.map { case (n, ns) =>
        val votes = ns.groupBy(prev).map { case (l, xs) => l -> xs.size }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  // two triangles joined by one weak bridge c-x: LPA must find exactly
  // the two triangles
  private val twoTriangles = Seq(
    ("a", "b"), ("b", "c"), ("c", "a"),
    ("x", "y"), ("y", "z"), ("z", "x"),
    ("c", "x"))

  test("labelPropagation matches the scalar reference (1..3 iters)") {
    val df = twoTriangles.toDF("s", "d")
    for (iters <- 1 to 3) {
      val got = Graph.labelPropagation(df, "s", "d", iters)
        .as[(String, String)].collect().toMap
      assert(got === refLpa(twoTriangles, iters), s"iters=$iters")
    }
  }

  test("labelPropagation finds the two triangle communities") {
    val got = Graph.labelPropagation(twoTriangles.toDF("s", "d"), "s", "d", 3)
      .as[(String, String)].collect().toMap
    val comms = got.groupBy(_._2).values.map(_.keys.toSet).toSet
    assert(comms === Set(Set("a", "b", "c"), Set("x", "y", "z")))
  }

  test("labelPropagation: 10-round deep run exercises the checkpoint path") {
    // a path graph keeps oscillating under synchronous LPA, so 10 rounds
    // stay non-trivial; rounds 5 and 10 cross the localCheckpoint
    // cadence — the result must still equal the scalar recurrence
    val path = (0 until 12).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val got = Graph.labelPropagation(path.toDF("s", "d"), "s", "d", 10)
      .as[(String, String)].collect().toMap
    assert(got === refLpa(path, 10))
  }

  test("labelPropagation: directed input symmetrizes; partition-invariant") {
    val fwd = twoTriangles.toDF("s", "d")
    val sym = (twoTriangles ++ twoTriangles.map(_.swap)).toDF("s", "d")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.labelPropagation(df, "s", "d", 3)
        .as[(String, String)].collect().toMap
    assert(run(fwd) === run(sym))
    assert(run(fwd.repartition(7)) === run(fwd))
  }

  /** Scalar reference: the classic sequential min-degree peel (coreness
   * of v = the max k in force when v is removed). Removal order among
   * equal-degree nodes is arbitrary — coreness is order-invariant. */
  private def bruteCoreness(edges: Seq[(String, String)]): Map[String, Long] = {
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val adj = scala.collection.mutable.Map(sym.groupBy(_._1).map {
      case (n, xs) => n -> scala.collection.mutable.Set(xs.map(_._2): _*)
    }.toSeq: _*)
    val core = scala.collection.mutable.Map.empty[String, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val minDeg = adj.valuesIterator.map(_.size).min
      if (minDeg > k) k = minDeg
      val v = adj.collectFirst { case (n, s) if s.size <= k => n }.get
      core(v) = k
      adj(v).foreach(u => adj.get(u).foreach(_.remove(v)))
      adj.remove(v)
    }
    core.toMap
  }

  test("coreness: K4 + tail + triangle by hand") {
    // K4 (coreness 3) with a 2-node tail (coreness 1) and a separate
    // triangle (coreness 2)
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b } yield (a, b)
    val g = k4 ++ Seq(("d", "t1"), ("t1", "t2"),
      ("x", "y"), ("y", "z"), ("z", "x"))
    val got = Graph.coreness(g.toDF("s", "d"), "s", "d", iters = 8)
      .select($"node", $"coreness").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "t1" -> 1L, "t2" -> 1L, "x" -> 2L, "y" -> 2L, "z" -> 2L))
    assert(got === bruteCoreness(g))
  }

  test("coreness matches the sequential peel on a hashed random graph") {
    val edges = (0 until 400).map { i =>
      val a = (i * 2654435761L) % 60; val b = (i * 40503L + 17) % 60
      (s"n$a", s"n$b")
    }.filter(e => e._1 != e._2)
    val got = Graph.coreness(edges.toDF("s", "d"), "s", "d", iters = 20)
      .select($"node", $"coreness").as[(String, Long)].collect().toMap
    assert(got === bruteCoreness(edges))
    // degree column is the symmetric-dedup degree
    val degs = Graph.coreness(edges.toDF("s", "d"), "s", "d", iters = 0)
      .select($"node", $"degree", $"coreness")
      .as[(String, Long, Long)].collect()
    degs.foreach { case (n, d, c) => assert(c == d, s"iters=0 must be degree: $n") }
  }

  test("coreness: h-index rounds are monotone non-increasing upper bounds") {
    val edges = (0 until 300).map { i =>
      val a = (i * 48271L) % 40; val b = (i * 69621L + 5) % 40
      (s"n$a", s"n$b")
    }.filter(e => e._1 != e._2)
    val runs = Seq(1, 2, 4, 20).map { it =>
      Graph.coreness(edges.toDF("s", "d"), "s", "d", iters = it)
        .select($"node", $"coreness").as[(String, Long)].collect().toMap
    }
    val brute = bruteCoreness(edges)
    runs.sliding(2).foreach { case Seq(hi, lo) =>
      hi.keys.foreach(n => assert(hi(n) >= lo(n), s"not monotone at $n")) }
    runs.foreach(r => r.keys.foreach(n =>
      assert(r(n) >= brute(n), s"not an upper bound at $n")))
    assert(runs.last === brute)
  }

  test("coreness: deep path graph exercises the checkpoint path, still exact") {
    // a 14-node path peels 1 wave per round from each end — 10+ rounds
    // cross the localCheckpoint cadence twice; everything is coreness 1
    val path = (0 until 14).map(i => (f"p$i%02d", f"p${i + 1}%02d"))
    val got = Graph.coreness(path.toDF("s", "d"), "s", "d", iters = 12)
      .select($"node", $"coreness").as[(String, Long)].collect().toMap
    assert(got === bruteCoreness(path))
    assert(got.values.forall(_ == 1L))
  }

  test("coreness: early-exits at the fixed point, iters is only a cap") {
    // K4 is its own fixed point (every neighbor multiset is [3,3,3], H =
    // 3 = degree): one round proves no change, 99 capped rounds never run
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d")
      if a < b } yield (a, b)
    val (k4Out, k4Rounds) =
      Graph.corenessWithRounds(k4.toDF("s", "d"), "s", "d", iters = 100)
    assert(k4Rounds === 1, s"K4 must converge in 1 round, ran $k4Rounds")
    assert(k4Out.select($"coreness").as[Long].collect().forall(_ == 3L))
    // a 24-node path needs ~11 peel waves (> the default cap of 8) —
    // the early-exit makes a generous cap safe: exact coreness, and the
    // loop stops at the fixed point instead of running all 100 rounds
    val path = (0 until 23).map(i => (f"p$i%02d", f"p${i + 1}%02d"))
    val (got, rounds) =
      Graph.corenessWithRounds(path.toDF("s", "d"), "s", "d", iters = 100)
    val vals = got.select($"node", $"coreness").as[(String, Long)]
      .collect().toMap
    assert(vals === bruteCoreness(path))
    assert(vals.values.forall(_ == 1L))
    assert(rounds > 8 && rounds < 20,
      s"expected ~12 rounds (peel depth + 1 no-change round), ran $rounds")
  }

  test("triangleStats: wheel graph W5 by hand") {
    // 5-cycle h0..h4 + hub connected to all: 5 triangles total;
    // rim nodes sit in 2 (deg 3), the hub in all 5 (deg 5)
    val rim = (0 until 5).map(i => (s"h$i", s"h${(i + 1) % 5}"))
    val spokes = (0 until 5).map(i => ("hub", s"h$i"))
    val got = Graph.triangleStats((rim ++ spokes).toDF("s", "d"), "s", "d")
      .orderBy($"node")
      .as[(String, Long, Long, Long)].collect().toSeq
    val exp = (0 until 5).map(i => (s"h$i", 3L, 2L, 666666L)) :+
      (("hub", 5L, 5L, 500000L))
    assert(got == exp, got.toString)
  }

  test("triangleStats matches brute-force enumeration on a hashed graph") {
    val edges = (0 until 120).map(i =>
      ((i * 7) % 25).toLong -> ((i * i + 3) % 25).toLong)
      .filter(e => e._1 != e._2)
    val got = Graph.triangleStats(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // brute force over the simple undirected graph
    val und = edges.flatMap(e => Seq(e, e.swap)).distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keys.toSeq.sorted
    val triOf = nodes.map { v =>
      val nb = adj(v).toSeq
      v -> (for {
        i <- nb.indices.iterator; j <- (i + 1) until nb.size
        if adj(nb(i)).contains(nb(j))
      } yield 1).sum.toLong
    }.toMap
    val expect = nodes.map { v =>
      val d = adj(v).size.toLong
      val t = triOf(v)
      v -> ((d, t, if (d < 2) 0L else (2 * t * 1000000L) / (d * (d - 1))))
    }.toMap
    assert(got == expect)
    // global count: each triangle counted at 3 nodes
    assert(got.values.map(_._2).sum % 3 == 0)
  }

  test("triangleStats: directed duplicates and self-loops collapse") {
    val e = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "a"))
    val got = Graph.triangleStats(e.toDF("s", "d"), "s", "d")
      .orderBy($"node")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 1L, 1000000L), ("b", 2L, 1L, 1000000L),
      ("c", 2L, 1L, 1000000L)))
  }
}
