package graft.risk

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Column-level API surface of the engine — the Scala equivalent of the
 * reference's UDF census (`/root/reference/utils/var_udf.py`).
 *
 * Design rule (SURVEY.md §2.10): anything expressible as a native Catalyst
 * expression IS one (whole-stage codegen, no serialization hop); only
 * genuinely scalar-opaque math (interpolated quantile, Vector ops) stays a
 * Scala UDF — which still runs in-JVM, unlike the reference's Python UDFs
 * that break codegen and pay an Arrow round-trip per batch.
 */
object functions {

  // ---------------------------------------------------------------- native

  /** Log return ln(close/first) — `compute_return` (`utils/var_udf.py:5-8`)
   * as a codegen'd native expression, no UDF. `try_divide` so a zero
   * previous price yields null (dropped by downstream aggregates) instead
   * of failing the whole job under ANSI mode — one bad tick must not kill
   * a 100 TB scan; `log` itself already nulls non-positive ratios. */
  def logReturn(close: Column, first: Column): Column = log(try_divide(close, first))

  /** Indicator-style log return ln(prev/cur) — NB the reference's
   * deliberate sign convention at `01_var_market_etl.py:144` (negative of
   * the conventional return); preserved for parity. Zero-divisor-safe
   * like [[logReturn]]. */
  def indicatorLogReturn(prev: Column, cur: Column): Column = log(try_divide(prev, cur))

  /** Squared error (p-a)^2 — `wsse_udf` (`utils/var_udf.py:11-13`). */
  def wsse(predicted: Column, actual: Column): Column =
    pow(predicted - actual, lit(2))

  /** Weighted scalar return — `05_var_compliance.py:51`. */
  def weightedReturn(ret: Column, weight: Column): Column = ret * weight

  /** Breach count over an array column: #elements <= threshold. Native
   * higher-order filter — `count_breaches` core (`utils/var_udf.py:23`). */
  def breachCount(xs: Column, threshold: Column): Column =
    size(filter(xs, x => x <= threshold))

  /** Basel traffic-light zone from a breach count (code semantics of
   * `utils/var_udf.py:24-30`): <=3 green(0), <10 yellow(1), else red(2). */
  def baselZone(breaches: Column): Column =
    when(breaches <= 3, 0).when(breaches < 10, 1).otherwise(2)

  /** `count_breaches` end-to-end: array + threshold -> zone. */
  def breachZone(xs: Column, threshold: Column): Column =
    baselZone(breachCount(xs, threshold))

  /** Non-linear feature expansion (`utils/var_utils.py:47-55`) as a native
   * expression: per factor x -> [x, sign(x)x^2, x^3, sign(x)sqrt|x|]. */
  def nonLinearFeatures(xs: Column): Column =
    flatten(transform(xs, x =>
      array(x, signum(x) * x * x, x * x * x, signum(x) * sqrt(abs(x)))))

  /** Linear scoring w0 + dot(w[1:], fs) (`utils/var_utils.py:58-62`) as a
   * native expression: zip_with product + aggregate sum. */
  def predictLinear(weights: Column, features: Column): Column =
    element_at(weights, 1) + aggregate(
      zip_with(slice(weights, lit(2), size(weights) - 1), features, (w, f) => w * f),
      lit(0.0), (acc, x) => acc + x)

  /** Element-wise mean of an array-of-arrays column — native equivalent of
   * `compute_avg` (`utils/var_udf.py:44-48`). */
  def meanVectorCol(xs: Column): Column = {
    val sums = aggregate(
      xs,
      transform(element_at(xs, 1), _ => lit(0.0)),
      (acc, row) => zip_with(acc, row, (a, b) => a + b))
    transform(sums, s => s / size(xs))
  }

  // ------------------------------------------------------------------ UDFs

  /** VaR at confidence c over an array<double> of simulations — linear
   * interpolation (numpy/`quantile_cont` parity); NOT `percentile_approx`.
   * `get_var_udf` (`utils/var_udf.py:16-19`). */
  val varAt = udf { (simulations: Seq[Double], confidence: Double) =>
    VarMath.valueAtRisk(simulations.toArray, confidence)
  }

  /** VaR over an ml.linalg.Vector of simulations (trials-table layout). */
  val varAtVec = udf { (simulations: Vector, confidence: Double) =>
    VarMath.valueAtRisk(simulations.toArray, confidence)
  }

  /** Expected shortfall over array<double> — `get_shortfall_udf`
   * (`utils/var_udf.py:33-36`). */
  val shortfallAt = udf { (simulations: Seq[Double], confidence: Double) =>
    VarMath.expectedShortfall(simulations.toArray, confidence)
  }

  /** Expected shortfall over an ml.linalg.Vector. */
  val shortfallAtVec = udf { (simulations: Vector, confidence: Double) =>
    VarMath.expectedShortfall(simulations.toArray, confidence)
  }

  /** Element-wise Vector scale — `weighted_returns` (`utils/var_udf.py:39-41`).
   * VectorUDT has no native arithmetic, so a UDF is required. */
  val weightedVector = udf { (returns: Vector, weight: Double) =>
    val a = returns.toArray
    var i = 0
    while (i < a.length) { a(i) *= weight; i += 1 }
    Vectors.dense(a)
  }

  /** Sample covariance (ddof=1) of an array-of-arrays column —
   * `compute_cov` (`utils/var_udf.py:51-54`). */
  val covMatrixUdf = udf { (xs: Seq[Seq[Double]]) =>
    VarMath.covMatrix(xs.map(_.toArray)).map(_.toSeq)
  }

  /** Element-wise mean UDF twin of [[meanVectorCol]] for exact reference
   * shape (`compute_avg`). */
  val meanVectorUdf = udf { (xs: Seq[Seq[Double]]) =>
    VarMath.meanVector(xs.map(_.toArray)).toSeq
  }

  /** (trial_id list, return list) -> dense Vector with returns placed at
   * their trial index — `to_vector` (`03_var_monte_carlo.py:124-127`). */
  val toDenseVector = udf { (trialIds: Seq[Long], returns: Seq[Double]) =>
    val a = new Array[Double](trialIds.length)
    var i = 0
    while (i < trialIds.length) { a(trialIds(i).toInt) = returns(i); i += 1 }
    Vectors.dense(a)
  }

  /** array<double> -> ml Vector (for Summarizer interop). */
  val arrayToVector = udf { (xs: Seq[Double]) => Vectors.dense(xs.toArray) }

  /** ml Vector -> array<double>. */
  val vectorToArray = udf { (v: Vector) => v.toArray.toSeq }
}
