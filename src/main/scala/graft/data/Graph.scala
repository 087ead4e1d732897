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
   * 1-row aggregate per iteration (an anti-join sum cross-joined back
   * into the lazy plan; nothing is collected, the chain stays one job).
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
      iters: Int = 3, redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    try {
      val n = nodes.count()
      require(n > 0, "pageRank on an empty edge list")
      val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val init = 1000000000L / n     // floor, same as the oracle's `//`
      val base = 150000000L / n      // (1 - d)/N with d = 0.85, in micros
      var r = nodes.withColumn("r", lit(init))
      for (i <- 1 to iters) {
        val contrib = e
          .join(r.withColumnRenamed("node", "src"), Seq("src"))
          .join(outDeg, Seq("src"))
          .select(col("dst").as("node"), expr("r div deg").as("t"))
          .groupBy(col("node")).agg(sum(col("t")).as("c"))
        r =
          if (!redistributeDangling)
            nodes.join(contrib, Seq("node"), "left")
              .select(col("node"),
                (lit(base) + expr("(17 * coalesce(c, 0L)) div 20")).as("r"))
          else {
            // dangling mass this iteration: rank held by nodes absent
            // from the out-degree table. A 1-row LAZY aggregate
            // cross-joined back in (Catalyst broadcasts the single
            // row) — a driver-side collect here would execute the
            // whole lineage once per iteration
            val dang = r
              .join(outDeg.select(col("src").as("node")), Seq("node"), "left_anti")
              .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
            nodes.join(contrib, Seq("node"), "left")
              .crossJoin(dang)
              .select(col("node"),
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
}
