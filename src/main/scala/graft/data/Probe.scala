package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * LINEAR-PROBE quality classifier over embeddings — the model-based
 * quality-filter axis of an LLM data pipeline (FineWeb-Edu / DCLM
 * shape: train a tiny classifier ON EMBEDDINGS of a labeled sample,
 * score the whole corpus, keep the top), complementing the rule-based
 * gates ([[TextFunctions.gopherKeep]]/`c4Keep`) and the n-gram LM
 * perplexity axis ([[NgramLm]]).
 *
 * Scale shape: training's ONLY corpus-touching work is one pass of
 * sum-decomposable sufficient statistics ([[suffStats]] — per-row outer
 * products, map-side combined into (d+2)² cells); the (d+1)×(d+1)
 * ridge solve happens on the driver (microseconds at embedding dims)
 * and the learned weights broadcast back as literals, so SCORING is a
 * map-only dot product ([[score]], native `vec_dot`). No iteration, no
 * gradient steps, no shuffle beyond the one 4-KB-cell aggregation —
 * a closed-form probe is the 100 TB-friendly spelling of "train a
 * quality classifier", and on frozen embeddings it is the standard one
 * (linear probing).
 *
 * Oracle parity: every sufficient-statistic cell is a sum of per-row
 * products rounded to integer MICRO-UNITS and summed as longs (the
 * repo's float-sum pattern), so the statistics — the distributed part —
 * are exact integer arithmetic reproducible from DuckDB (q84); the
 * driver-side solve is deterministic on those exact inputs and pinned
 * by `ProbeSpec`'s planted-weight recovery.
 */
object Probe {

  /**
   * Sufficient statistics of ridge regression in ONE aggregation:
   * with `z = [1.0] ++ v ++ [y]` per row, emit every `z_i · z_j`
   * product rounded to micro-units and sum per cell — `(pos, s)` with
   * `pos = i·(d+2) + j`. The top-left (d+1)² block is `XᵀX` (with
   * intercept), the last column `Xᵀy`, the corner `yᵀy`. One narrow
   * explode + one 4356-key (d=64) hash aggregation with map-side
   * combine; nothing else ever touches the corpus during training.
   */
  def suffStats(df: DataFrame, vecCol: String, labelCol: String): DataFrame = {
    val z = concat(array(lit(1.0)), col(vecCol).cast("array<double>"),
      array(col(labelCol).cast("double")))
    df.select(z.as("__z"))
      .select(posexplode(flatten(transform(col("__z"), vi =>
        transform(col("__z"), vj =>
          round(vi * vj * lit(1e6), 0).cast("long"))))))
      .groupBy(col("pos").cast("long").as("pos"))
      .agg((sum(col("col")).cast("double") / lit(1e6)).as("s"))
  }

  /**
   * Closed-form ridge fit: collect the (d+2)² statistic cells (a few
   * KB — independent of corpus size), solve
   * `(XᵀX + λ·diag(0,1,…,1)) w = Xᵀy` (intercept unpenalized) on the
   * driver. Returns `[w₀ (intercept), w₁ … w_d]`.
   */
  def fitRidge(df: DataFrame, vecCol: String, labelCol: String,
      lambda: Double = 0.0): Array[Double] = {
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    val cells = suffStats(df, vecCol, labelCol)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val m = math.sqrt(cells.size).round.toInt // d + 2
    require(m.toLong * m == cells.size && m >= 3,
      s"suffStats returned ${cells.size} cells — not a (d+2)^2 grid")
    val n = m - 1 // d + 1 unknowns (intercept + d weights)
    val xtx = new org.apache.commons.math3.linear.Array2DRowRealMatrix(n, n)
    val xty = new Array[Double](n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        val reg = if (i == j && i > 0) lambda else 0.0
        xtx.setEntry(i, j, cells(i.toLong * m + j) + reg)
        j += 1
      }
      xty(i) = cells(i.toLong * m + (m - 1))
      i += 1
    }
    new org.apache.commons.math3.linear.LUDecomposition(xtx).getSolver
      .solve(new org.apache.commons.math3.linear.ArrayRealVector(xty))
      .toArray
  }

  /** Map-only probe score `w₀ + ⟨w, v⟩` from broadcast literal weights
   * (native `vec_dot` — stays inside whole-stage codegen). */
  def score(vec: Column, weights: Array[Double]): Column =
    lit(weights(0)) + Similarity.dotNative(vec.cast("array<double>"),
      typedLit(weights.drop(1).toSeq))

  /** The one-call filter: fit on the labeled sample, keep corpus rows
   * scoring ≥ `minScore` (FineWeb-Edu keeps educational-score ≥ 3 of
   * 5 — same shape). */
  def qualityFilter(corpus: DataFrame, labeled: DataFrame, vecCol: String,
      labelCol: String, minScore: Double, lambda: Double = 0.0): DataFrame = {
    val w = fitRidge(labeled, vecCol, labelCol, lambda)
    corpus.filter(score(col(vecCol), w) >= minScore)
  }
}
