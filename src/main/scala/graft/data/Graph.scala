package graft.data

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph algorithms over edge DataFrames — the web-graph side of
 * corpus curation (host authority as a quality prior, as in Common-Crawl
 * pipelines that weight documents by their host's link rank).
 *
 * PageRank (Page, Brin, Motwani & Winograd 1999) here is the canonical
 * distributed shape: per iteration, ranks join edges on `src` (one shuffle
 * on the join key), contributions hash-aggregate on `dst` (second shuffle),
 * and the damping update is a map over the node table. Nothing is ever
 * broadcast or collected — node and edge tables stay distributed; driver
 * state is zero beyond the node COUNT. Edges and nodes are cached once and
 * reused by every iteration.
 *
 * All arithmetic is INTEGER MICRO-UNITS (rank × 1e9 as long): per-edge
 * contributions are floor-divided (`r div deg`), the damping update is
 * `(17 · Σ) div 20 + (0.15e9 div N)` — exact longs whose sums are
 * order-independent, so results are bit-identical across partitionings AND
 * across engines (the DuckDB oracle unrolls the same integer recurrence,
 * q85). Long headroom: ranks sum to ≤ 1e9, so no intermediate exceeds
 * 17e9 ≪ 2^63.
 */
object Graph {

  /**
   * Fixed-iteration damped PageRank over a directed edge list.
   * Returns (node, rank_micro, rank): rank_micro the exact long
   * (micro-units of probability mass), rank = rank_micro / 1e9 as double
   * (exact: longs < 2^53 convert losslessly).
   *
   * Dangling-node contract: with `redistributeDangling = false` (the
   * default) nodes with no out-edges LEAK their mass — fine for
   * symmetric (co-occurrence) graphs where every node has out-degree
   * ≥ 1, and a common simplification for link-quality scoring. For
   * genuinely DIRECTED web graphs pass `redistributeDangling = true`:
   * each iteration folds the dangling mass `D = Σ r(dangling)` back
   * uniformly — `r' = base + (17 · (contrib + D div N)) div 20`, the
   * classic teleporting-dangling correction — at the cost of ONE extra
   * 1-row aggregate per iteration (a single-column sum over the rank
   * table, whose carried `sw` column marks dangling nodes as null;
   * nothing is collected, the sum is cross-joined back into the plan).
   * Still exact integer micro-units: total mass is invariant up to
   * deterministic floor truncation (< |E| + 3N micros per iteration),
   * where the leaking default loses ~0.85·D per iteration instead.
   * Self-loops should be excluded by the caller.
   *
   * For large `iters`, lineage is truncated every 10 iterations with
   * `localCheckpoint` (the rank table is |nodes| rows — small relative to
   * edges); the default 3–5 iterations need no checkpoint.
   *
   * The result is CACHED AND MATERIALIZED before the edge/node caches
   * are released: the iterations run once, inside this call, while the
   * caches are warm. Returning the lazy plan instead would re-scan and
   * re-shuffle the raw edges once per iteration per caller action after
   * the `unpersist` — the iterative-trainer pitfall. Lineage is KEPT
   * (cache, not checkpoint): if executors holding the cached blocks are
   * lost, the result recomputes — slower (edges uncached by then) but
   * correct. Callers may `unpersist()` the returned frame when done.
   */
  def pageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, redistributeDangling: Boolean = false,
      weightCol: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // WEIGHTED variant (`weightCol`): per-edge contribution is
    // `(r · w) div Σw(src)` — the unweighted path is the SAME spelling
    // with w = 1, Σw = out-degree, so `r · 1 div deg == r div deg`
    // bit-for-bit and the unweighted oracles are untouched. Parallel
    // (src, dst) weighted edges pre-sum. Long headroom: r ≤ ~1.7e9
    // micro-units, so weights up to ~1e9 can't overflow `r · w`.
    val e = (weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .distinct().withColumn("w", lit(1L))
      case Some(wc) =>
        // non-positive weights dropped (a zero-total src would divide
        // by zero; negative mass has no random-walk meaning)
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(wc).cast("long").as("__w"))
          .filter(col("__w") > 0)
          .groupBy(col("src"), col("dst"))
          .agg(sum(col("__w")).as("w"))
    }).cache()
    try {
      // iteration-INVARIANT node table, built once and localCheckpoint'd:
      // (node, sw) with sw = total out-weight, null for dangling nodes.
      // Carrying sw ON the rank table turns the former two joins per
      // iteration (rank + an out-degree table re-aggregated from the
      // edge cache every round) into one, and turns the dangling-mass
      // anti-join into a single column scan of the rank table.
      // Built in ONE map-combinable aggregation: src rows carry their
      // weight, dst rows a null — `sum` ignores nulls, so a node seen
      // only as a dst sums to null (dangling) and a src node sums its
      // exact out-weight, bit-identical to the former distinct-union +
      // out-degree left join at a third of the exchanges (the up-front
      // job r12 measured as a net loss on small simple-path graphs).
      val nodeStat = e.select(col("src").as("node"), col("w"))
        .union(e.select(col("dst").as("node"),
          lit(null).cast("long").as("w")))
        .groupBy(col("node")).agg(sum(col("w")).as("sw"))
        .localCheckpoint()
      val n = nodeStat.count()
      require(n > 0, "pageRank on an empty edge list")
      val init = 1000000000L / n     // floor, same as the oracle's `//`
      val base = 150000000L / n      // (1 - d)/N with d = 0.85, in micros
      var r = nodeStat.withColumn("r", lit(init))
      for (i <- 1 to iters) {
        // every src in e has out-edges, so its carried sw is non-null
        // and equals the former outDeg join's sw bit-for-bit
        val contrib = e
          .join(r.select(col("node").as("src"), col("sw"), col("r")),
            Seq("src"))
          .select(col("dst").as("node"), expr("(r * w) div sw").as("t"))
          .groupBy(col("node")).agg(sum(col("t")).as("c"))
        r =
          if (!redistributeDangling)
            nodeStat.join(contrib, Seq("node"), "left")
              .select(col("node"), col("sw"),
                (lit(base) + expr("(17 * coalesce(c, 0L)) div 20")).as("r"))
          else {
            // dangling mass this iteration: rank held by nodes with no
            // out-edges (sw null) — ONE 1-row LAZY aggregate over the
            // checkpointed rank table, cross-joined back in (Catalyst
            // broadcasts the single row); no anti-join, nothing
            // collected
            val dang = r
              .agg(coalesce(sum(when(col("sw").isNull, col("r"))), lit(0L))
                .as("dm"))
            nodeStat.join(contrib, Seq("node"), "left")
              .crossJoin(dang)
              .select(col("node"), col("sw"),
                (lit(base) +
                  expr(s"(17 * (coalesce(c, 0L) + dm div ${n}L)) div 20")).as("r"))
          }
        // the redistributing update reads r TWICE (contribution join +
        // dangling aggregate): truncate lineage every iteration there,
        // or each level would re-derive the previous rank table twice —
        // a 2^iters blowup in both analysis and execution. The rank
        // table is |nodes| rows, so the per-iteration materialization
        // is the cheap side of that trade.
        if (redistributeDangling || i % 10 == 0) r = r.localCheckpoint()
      }
      val out = r.select(col("node"), col("r").as("rank_micro"),
          (col("r").cast("double") / lit(1e9)).as("rank"))
        .cache()
      out.count() // eager: runs the iterations while e is cached
      out
    } finally { e.unpersist(); () }
  }

  /**
   * PERSONALIZED PageRank — the teleport vector is concentrated on a
   * SEED set instead of uniform: `r' = [node ∈ seeds]·(1−d)/|S| +
   * d·Σ contrib`. With trusted seed hosts this is exactly TrustRank
   * (Gyöngyi, Garcia-Molina, Pedersen — VLDB 2004): mass flows outward
   * from the trusted core, so spam clusters that PageRank rewards (they
   * interlink heavily but are rarely linked FROM the good web) score ~0
   * — the crawl-frontier trust prior that complements [[pageRank]]'s
   * global authority.
   *
   * Same exact-integer micro-unit arithmetic, weighted-edge handling,
   * and caching discipline as [[pageRank]] (one contribution shuffle
   * per iteration; nothing collected). Differences: initial and
   * teleport mass are `1e9 div |S|` / `150000000 div |S|` on seed
   * nodes and 0 elsewhere, so non-seed nodes start at 0 and earn mass
   * only through in-links. Seeds not present in the edge set are
   * ignored (the graph defines the node universe); `seeds` is
   * by-contract small (a curated trust list) but is still only ever
   * joined — never collected — so a large seed list degrades, not
   * breaks. Dangling mass is dropped (the classic leak) matching
   * [[pageRank]]'s default.
   *
   * Returns `(node, rank_micro, rank)`.
   */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iters: Int = 3, weightCol: Option[String] = None): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = (weightCol match {
      case None =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .distinct().withColumn("w", lit(1L))
      case Some(wc) =>
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
            col(wc).cast("long").as("__w"))
          .filter(col("__w") > 0)
          .groupBy(col("src"), col("dst"))
          .agg(sum(col("__w")).as("w"))
    }).cache()
    val sd = seeds.select(col(seedCol).as("node")).distinct()
    // seed flag AND out-weight ride the node table: 1 row per node,
    // built once and localCheckpoint'd (the former per-iteration outDeg
    // join re-aggregated the edge cache every round — same rework as
    // [[pageRank]])
    val nodes = e.select(col("src").as("node"), col("w"))
      .union(e.select(col("dst").as("node"),
        lit(null).cast("long").as("w")))
      .groupBy(col("node")).agg(sum(col("w")).as("sw"))
      .join(sd.withColumn("__s", lit(1L)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("__s"),
        col("sw"))
      .localCheckpoint()
    try {
      val nSeeds =
        nodes.agg(sum(col("__s"))).head().getLong(0) // bounded: one long
      require(nSeeds > 0,
        "personalizedPageRank: no seed appears in the edge set")
      val init = 1000000000L / nSeeds
      val base = 150000000L / nSeeds
      var r = nodes.withColumn("r", col("__s") * init)
        .select(col("node"), col("sw"), col("r"))
      for (i <- 1 to iters) {
        // every src in e has out-edges, so its carried sw is non-null
        val contrib = e
          .join(r.select(col("node").as("src"), col("sw"), col("r")),
            Seq("src"))
          .select(col("dst").as("node"), expr("(r * w) div sw").as("t"))
          .groupBy(col("node")).agg(sum(col("t")).as("c"))
        r = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"), col("sw"),
            (col("__s") * lit(base) +
              expr("(17 * coalesce(c, 0L)) div 20")).as("r"))
        if (i % 10 == 0) r = r.localCheckpoint()
      }
      val out = r.select(col("node"), col("r").as("rank_micro"),
          (col("r").cast("double") / lit(1e9)).as("rank"))
        .cache()
      out.count()
      out
    } finally { e.unpersist(); () }
  }

  /**
   * Fixed-iteration HITS (Kleinberg, JACM 1999) over a directed edge
   * list — hubs point at good authorities, authorities are pointed at
   * by good hubs. The link-analysis complement to [[pageRank]]: where
   * PageRank ranks by global random-walk mass, HITS separates "pages
   * that collect good links" (hubs — directories, link lists) from
   * "pages good links collect to" (authorities) — both useful as
   * quality priors when curating a crawl.
   *
   * Per iteration: authorities from the PREVIOUS hubs (edges join hubs
   * on `src`, sum on `dst` — two keyed shuffles), L1-normalize; hubs
   * from the NEW authorities (join on `dst`, sum on `src`), normalize.
   * Normalization is exact integer micro-units like [[pageRank]]:
   * `v' = raw · 1e9 div Σraw`, where each Σ is a 1-row LAZY aggregate
   * cross-joined back (Catalyst broadcasts the row; nothing collected).
   * Classic HITS normalizes by the L2 norm; the L1 spelling keeps the
   * arithmetic in order-independent longs (bit-identical across
   * partitionings AND engines — q98's DuckDB oracle unrolls the same
   * recurrence) and yields the same RANKING (normalization only
   * rescales). Headroom: after normalization each score table sums to
   * ≤ 1e9, so a node's raw sum is ≤ 1e9 and `raw · 1e9 ≤ 1e18 < 2^63`.
   *
   * Each half-step's FLOW AGGREGATION (the keyed shuffle) is
   * `localCheckpoint`ed — it is read twice (its Σ and the outer join) —
   * while the |nodes|-row normalization stays lazy over the checkpoint,
   * keeping lineage — and planner time — constant in `iters` without
   * materializing the cheap half. Result is cached and materialized
   * while the edge cache is warm, like [[pageRank]].
   * Nodes with no in-edges get authority 0; no out-edges, hub 0.
   *
   * Returns `(node, auth_micro, hub_micro, auth, hub)` — exact longs
   * plus their double forms (lossless: < 2^53).
   */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    try {
      val n = nodes.count()
      require(n > 0, "hits on an empty edge list")
      val init = 1000000000L / n
      var hub = nodes.withColumn("v", lit(init))
      var auth = nodes.withColumn("v", lit(0L)).filter(col("v") =!= 0L)
      // one half-step: scores flow across edges from `from` to `to`,
      // then L1-renormalize to 1e9 total (floor division, exact longs).
      // The expensive half — the keyed shuffle over the edge cache — is
      // what gets localCheckpoint'd; the normalization stays LAZY (read
      // at most twice: the next half-step's join + the final output
      // join, each a shallow plan over the checkpoint), so each
      // half-step materializes the flow aggregation exactly once instead
      // of evaluating it under both the Σ-aggregate and the outer join.
      // Score tables stay SPARSE between half-steps: a node missing from
      // `raw` received no flow — exactly a v = 0 row, and zero rows
      // neither contribute to the next flow join's sums nor to Σraw, so
      // the per-half-step |nodes| outer join (one more join + exchange
      // per half-step, r12's remaining q98 job floor) is dropped and the
      // zeros are densified ONCE at the output join. Bit-identical: the
      // normalization `raw·1e9 div s` never maps a present row to a
      // different value, and absent ⟺ 0 throughout.
      def halfStep(scores: DataFrame, from: String, to: String): DataFrame = {
        val raw = e
          .join(scores.withColumnRenamed("node", from), Seq(from))
          .groupBy(col(to).as("node")).agg(sum(col("v")).as("raw"))
          .localCheckpoint()
        val tot = raw.agg(coalesce(sum(col("raw")), lit(0L)).as("s"))
        raw.crossJoin(tot)
          .select(col("node"),
            coalesce(expr("raw * 1000000000 div s"), lit(0L)).as("v"))
      }
      for (_ <- 1 to iters) {
        auth = halfStep(hub, "src", "dst")
        hub = halfStep(auth, "dst", "src")
      }
      val out = nodes
        .join(auth.select(col("node"), col("v").as("auth_micro")),
          Seq("node"), "left")
        .join(hub.select(col("node"), col("v").as("hub_micro")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("auth_micro"), lit(0L)).as("auth_micro"),
          coalesce(col("hub_micro"), lit(0L)).as("hub_micro"))
        .select(col("node"), col("auth_micro"), col("hub_micro"),
          (col("auth_micro").cast("double") / lit(1e9)).as("auth"),
          (col("hub_micro").cast("double") / lit(1e9)).as("hub"))
        .cache()
      out.count() // eager: runs the iterations while e/nodes are cached
      out
    } finally { e.unpersist(); nodes.unpersist(); () }
  }

  /** Undirected co-occurrence edges from (group, member) pairs: both
   * directions of every distinct within-group member pair — the host
   * co-citation graph when `member` is a URL host and `group` a doc. */
  def coOccurrenceEdges(
      pairs: DataFrame, groupCol: String, memberCol: String): DataFrame = {
    val a = pairs.select(col(groupCol).as("g"), col(memberCol).as("src")).distinct()
    val b = pairs.select(col(groupCol).as("g"), col(memberCol).as("dst")).distinct()
    a.join(b, Seq("g"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
  }

  /**
   * Community detection by SYNCHRONOUS label propagation (Raghavan,
   * Albert, Kumara 2007) — the near-linear-time community pass used to
   * group hosts/domains before per-community curation decisions
   * (crawl-budget allocation per community, dedup within a community,
   * domain-mix reporting). Each round, every node adopts the label
   * held by the PLURALITY of its neighbors; ties break to the SMALLEST
   * label, and all nodes update together from the previous round's
   * labels — fully deterministic for a fixed `iters` (the classic
   * async/random-order variant is not, and cross-engine parity would be
   * impossible). Labels start as each node's own id, so a label is
   * always "the id of some member", and community ids are stable across
   * reruns.
   *
   * Input edges are treated as UNDIRECTED: the list is symmetrized
   * (both directions union'd, self-loops dropped) before iterating, so
   * callers can pass either a directed link graph or an already
   * symmetric co-occurrence list. Multi-edges collapse (distinct) —
   * neighbor votes are per-neighbor, not per-edge.
   *
   * Scale shape, per round: ONE join of the |V|-row label table into
   * the cached symmetric edge list (shuffle keyed by src) and one
   * (node, label) count aggregation (map-side combinable) followed by a
   * min-struct argmax — no window over raw edges, nothing collected,
   * nothing broadcast from the graph side. Edges are cached once across
   * all rounds; the label table is |V| rows and its lineage is
   * truncated every 5 rounds (`localCheckpoint`), so a deep community
   * run never carries more than 4 rounds of join/agg lineage into the
   * next stage — re-computation on a lost partition is bounded, and
   * the plan for the typical 3–5 round run keeps its pure declarative
   * shape.
   * Like all fixed-point LPA, `iters` bounds work; 3–5 rounds settle
   * real web-host graphs (communities are diameter-bounded).
   *
   * Returns `(node, label)` — nodes sharing a `label` are one community.
   */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    try {
      // symmetrized, so every node occurs as a src
      var labels = e.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (i <- 1 to iters) {
        labels = e
          .join(labels.withColumnRenamed("node", "src"), Seq("src"))
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("c"))
          // plurality label, ties to the smallest: min over
          // (-count, label) is (max count, then min label)
          .groupBy(col("node"))
          .agg(min(struct((-col("c")).as("nc"), col("label"))).as("w"))
          .select(col("node"), col("w.label").as("label"))
        if (i % 5 == 0 && i < iters) labels = labels.localCheckpoint()
      }
      val out = labels.cache()
      out.count() // materialize while the edge cache is warm
      out
    } finally { e.unpersist(); () }
  }

  /**
   * TRIANGLE COUNT + local clustering coefficient per node — the
   * community-density panel ("is this link neighborhood organic or a
   * spam farm") next to [[pageRank]]/[[labelPropagation]].
   *
   * Degree-ordered node-iterator (Schank 2007): orient every undirected
   * edge from the lower endpoint to the higher under the total order
   * (degree, node) — each triangle then exists exactly once as wedge
   * a→b, a→c (b before c) closed by edge b→c. The orientation is the
   * scale move: max out-degree is O(√m) on any graph (arboricity
   * bound), so the wedge self-join fans out quadratically in the
   * ORIENTED degree, never in a hub's raw degree — a 10⁷-follower hub
   * contributes wedges only through its few higher-ordered neighbors.
   * Two keyed shuffles (wedge self-join + closing-edge semi join), one
   * count; nothing broadcast from the graph side.
   *
   * Returns `(node, degree, triangles, clustering_ppm)` with
   * `clustering_ppm = (2·t·10⁶) div (d·(d−1))` exact-integer (0 for
   * degree < 2), over the deduped simple graph (self-loops dropped,
   * parallel/bidirectional duplicates collapsed).
   */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    try {
      val deg = und.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree"))
      // orient src -> dst iff (deg, id)(src) < (deg, id)(dst); keeping
      // only the winning direction halves the table and makes every
      // triangle a unique (a; b, c) wedge + closing edge
      val withOrd = und
        .join(deg.select(col("node").as("src"), col("degree").as("ds")),
          Seq("src"))
        .join(deg.select(col("node").as("dst"), col("degree").as("dd")),
          Seq("dst"))
        .filter(struct(col("ds"), col("src")) < struct(col("dd"), col("dst")))
        .select(col("src"), col("dst"))
        .cache()
      val wedges = withOrd.as("x")
        .join(withOrd.as("y"), col("x.src") === col("y.src") &&
          col("x.dst") < col("y.dst"))
        .select(col("x.src").as("a"), col("x.dst").as("b"),
          col("y.dst").as("c"))
      // wedge (a; b, c) is a triangle iff oriented edge b->c or c->b
      // exists; orientation made exactly ONE of those possible, so an
      // inner join on the unordered closing pair counts each once
      val closing = withOrd.select(
        least(col("src"), col("dst")).as("b"),
        greatest(col("src"), col("dst")).as("c"))
      val tri = wedges
        .select(col("a"),
          least(col("b"), col("c")).as("b"), greatest(col("b"), col("c")).as("c"))
        .join(closing, Seq("b", "c"))
      val perNode = tri.select(col("a").as("node"))
        .union(tri.select(col("b").as("node")))
        .union(tri.select(col("c").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
      val out = deg.join(perNode, Seq("node"), "left")
        .select(col("node"), col("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .withColumn("clustering_ppm",
          when(col("degree") < 2, lit(0L))
            .otherwise(expr("(2 * triangles * 1000000L) div (degree * (degree - 1))")))
        .cache()
      out.count() // materialize while the edge caches are warm
      withOrd.unpersist()
      out
    } finally { und.unpersist(); () }
  }

  /**
   * CORENESS (k-core decomposition) by H-INDEX ITERATION (Lü, Zhou,
   * Zhang & Stanley 2016, "The H-index of a network node and its
   * relation to degree and coreness", Nature Communications 7:10168):
   * start every node at its degree and repeatedly replace `h(v)` with
   * the H-index of its neighbors' current values — the largest `h`
   * such that at least `h` neighbors hold a value ≥ `h`. Per node the
   * sequence is monotone non-increasing and its fixed point IS the
   * node's coreness (the largest `k` with the node inside the k-core),
   * so the sequential min-degree peel never has to be serialized onto
   * one machine. Like [[labelPropagation]], a fixed `iters` bounds
   * work: intermediate rounds are exact coreness UPPER bounds, and the
   * value settles once peel waves stop passing through the node —
   * dense cores and their fringes converge in a few rounds (the peel
   * depth, not the graph diameter, drives it; a long induced path is
   * the slow case).
   *
   * This is the dense-subgraph isolator the crawl-quality panel needs
   * next to [[pageRank]]/[[trustRank]]/[[triangleStats]]: a link
   * farm's mutual-citation core keeps `coreness ≈ core size` while
   * organically linked hosts shed theirs in the first rounds — filter
   * `coreness >= k` for the k-core subgraph.
   *
   * Edges symmetrize + dedup exactly like [[labelPropagation]] (pass
   * directed or undirected lists; multi-edges collapse). Scale shape
   * per round: ONE |V|-row value-table join into the cached symmetric
   * edge list (shuffle keyed by src) and one H-index aggregation spelt
   * as a PARTITIONED rank window + map-combinable max —
   * `h = max over neighbors of min(rank_by_desc_value, value)` — so no
   * per-node neighbor array ever materializes and a 10⁷-degree hub
   * costs sort-shuffle, never executor memory. The value table is |V|
   * rows, lineage truncated every 5 rounds.
   *
   * Returns `(node, degree, coreness)`.
   */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 8): DataFrame =
    corenessWithRounds(edges, srcCol, dstCol, iters)._1

  /** [[coreness]] plus the number of h-index rounds actually RUN —
   * `iters` is a CAP, not a schedule: the loop exits as soon as a round
   * changes nothing (caps ≤ 3 excepted — they run exactly `iters` lazy
   * fused rounds, since so small a cap cannot amortize per-round
   * convergence actions). Detection is one cheap `sum(h)` action per round:
   * every node's h-sequence is monotone non-increasing (Lü 2016, the
   * H-operator is monotone and h₁ ≤ h₀ = degree), so the |V|-row sum is
   * strictly decreasing until the global fixed point and equal sums ⇔
   * no node changed ⇔ every later round is the identity. Each round is
   * localCheckpoint-ed (eager): the convergence action and the next
   * round both read the materialized |V|-row table instead of replaying
   * the full round lineage — the per-round truncation that replaces the
   * old every-5-rounds cadence now that every round runs its own job.
   * Package-private so GraphSpec and the deep-iters probe can pin
   * rounds-to-convergence. */
  private[graft] def corenessWithRounds(edges: DataFrame, srcCol: String,
      dstCol: String, iters: Int): (DataFrame, Int) = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct().cache()
    try {
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("degree")).cache()
      var h = deg.select(col("node"), col("degree").as("h"))
      var rounds = 0
      if (iters <= 3) {
        // a tiny cap cannot amortize per-round convergence actions (the
        // early exit saves at most iters−1 rounds but costs a
        // materialization + a sum job per round — measured dominant on
        // small graphs): keep the rounds LAZY and fused into the final
        // job, the pre-convergence behavior
        for (i <- 1 to iters) h = hIndexRound(e, h)
        rounds = iters
      } else {
        def sumOf(df: DataFrame, c: String): Long = {
          val r = df.agg(sum(col(c))).head // NULL on an empty graph
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
        var prevSum = sumOf(deg, "degree")
        var converged = false
        while (rounds < iters && !converged) {
          rounds += 1
          h = hIndexRound(e, h).localCheckpoint()
          val s = sumOf(h, "h")
          if (s == prevSum) converged = true else prevSum = s
        }
      }
      val out = deg.join(h, Seq("node"))
        .select(col("node"), col("degree"), col("h").as("coreness"))
        .cache()
      out.count() // materialize while the edge cache is warm
      deg.unpersist()
      (out, rounds)
    } finally { e.unpersist(); () }
  }

  /** One h-index round: every node's value becomes the H-index of its
   * neighbors' values. Neighbor values stream through a rank window
   * PARTITIONED by the receiving node (ties order arbitrarily — the
   * H-index depends only on the sorted multiset, so the result is
   * deterministic and partition-invariant), then a map-combinable max
   * of `min(rank, value)`. Package-private so `PlanSpec` can pin the
   * un-materialized round plan. */
  private[data] def hIndexRound(e: DataFrame, h: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("dst")).orderBy(col("hn").desc)
    e.join(h.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("dst"), col("h").as("hn"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("dst").as("node"))
      .agg(max(least(col("rn"), col("hn"))).as("h"))
  }
}
