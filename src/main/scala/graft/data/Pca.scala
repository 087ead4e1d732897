package graft.data

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Distributed PCA over an embedding column — the dimensionality-reduction
 * scale path in front of similarity search (project 64..1024-dim vectors
 * to a handful of principal components, then feed [[Similarity]]'s
 * LSH/IVF on the cheaper vectors).
 *
 * Shape: ONE distributed pass accumulates first and second moments with a
 * map-side-combining [[Aggregator]]; a d×d eigenproblem is then solved on
 * the driver (cyclic Jacobi — d ≤ ~1k makes this microseconds, the
 * classic "aggregate statistics distributed, solve small dense problem
 * locally" split, same as [[graft.risk.Training]]'s normal equations);
 * projection is a broadcast-literal dot product, fully codegen'd.
 *
 * Determinism: moments are accumulated in FIXED-POINT (longs, 2^-24
 * units). Long addition is associative, so the covariance — and with it
 * the eigenbasis and every projection — is bit-identical under any
 * partitioning/executor count, unlike a double sum whose rounding drifts
 * with reduction order. That is what makes golden-pinning the projections
 * possible (q54). Eigenvector sign is fixed by convention (largest-|c|
 * coordinate positive, lowest index on tie).
 */
object Pca {

  /** Fitted model: quantized column means, top-k eigen-basis (rows are
   * components, descending eigenvalue), eigenvalues, and sample count. */
  case class Model(mean: Array[Double], basis: Array[Array[Double]],
      eigenvalues: Array[Double], n: Long)

  private val Scale = (1L << 24).toDouble

  /** Elementwise long-vector sum with map-side combine. */
  private class LongVecSum(size: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](size)
    def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      var i = 0; while (i < size) { b(i) += a(i); i += 1 }; b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = reduce(x, y)
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /**
   * Fit PCA on `vecCol` (array<float>/array<double>, fixed dimension).
   * One job: (1 + d + d(d+1)/2)-long moment vector summed distributed.
   *
   * Cost is O(d²) per ROW on the map side (the outer product) — fine
   * through d ≈ 256; for 1k+-dim embeddings use [[fitSampled]] (PCA needs
   * ~10·d² rows for a stable covariance, not the full 100 TB) and
   * [[transform]] everything.
   *
   * Input range: products are quantized to 2^-24 units, so the Long sums
   * need `n · max|x|² < 2^39` (≈5.5e11) to be overflow-safe — unit-norm
   * embeddings are fine to ~10^11 rows, |x| ≤ 100 to ~5×10^7 rows.
   * Components must be finite and |x| < 2^19 (a single larger product
   * overflows); violations fail fast instead of silently corrupting the
   * covariance (NaN/Inf would quantize to 0 via toLong).
   */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.select(size(col(vecCol))).first().getInt(0)
    require(k >= 1 && k <= d, s"need 1 <= k <= $d, got $k")
    val len = 1 + d + d * (d + 1) / 2

    val moments = df.select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]]
      .map { x =>
        val out = new Array[Long](len)
        out(0) = 1L
        val xq = new Array[Double](d)
        var i = 0
        while (i < d) {
          val xi = x(i)
          if (!java.lang.Double.isFinite(xi) || math.abs(xi) >= (1L << 19))
            throw new IllegalArgumentException(
              s"PCA input component $i is $xi — components must be finite " +
                "with |x| < 2^19; clean or clip upstream")
          val q = math.rint(xi * Scale)
          out(1 + i) = q.toLong
          xq(i) = q / Scale
          i += 1
        }
        var idx = 1 + d
        i = 0
        while (i < d) {
          var j = i
          while (j < d) {
            out(idx) = math.rint(xq(i) * xq(j) * Scale).toLong
            idx += 1; j += 1
          }
          i += 1
        }
        out
      }
      .select(new LongVecSum(len).toColumn)
      .first()

    val n = moments(0)
    require(n > 1, s"need > 1 row to fit PCA, got $n")
    val mean = Array.tabulate(d)(i => moments(1 + i) / Scale / n)
    val cov = Array.ofDim[Double](d, d)
    var idx = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val m2 = moments(idx) / Scale // Σ xq_i · xq_j
        val c = (m2 - n * mean(i) * mean(j)) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }

    val (eigVals, eigVecs) = jacobiEigen(cov)
    // order by eigenvalue descending, original index ascending on ties
    val order = eigVals.indices.sortBy(c => (-eigVals(c), c)).take(k)
    val basis = order.map { c =>
      val v = Array.tabulate(d)(r => eigVecs(r)(c))
      // sign convention: the largest-|coordinate| entry is positive
      var best = 0
      var r = 1
      while (r < d) { if (math.abs(v(r)) > math.abs(v(best))) best = r; r += 1 }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    Model(mean, basis, order.map(eigVals).toArray, n)
  }

  /**
   * One-call sample-then-fit — the d ≥ 1k scale path [[fit]] documents:
   * fit the basis on a deterministic [[Sampling.hashSample]] of the rows
   * (keep `num`/`den` of them by hash of `key`), then [[transform]] the
   * full corpus with the returned model. The sample is hash-deterministic
   * per key, so the model — and any golden pinned on its projections — is
   * reproducible under any partitioning or executor count.
   */
  def fitSampled(df: DataFrame, vecCol: String, k: Int, key: Column,
      num: Int, den: Int = 10000, salt: String = ""): Model =
    fit(Sampling.hashSample(df, key, num, den, salt), vecCol, k)

  /** Project `vecCol` onto the model's components: columns `pc0..pc{k-1}`,
   * each `dot(x, b_j) − dot(μ, b_j)` — one native dot product against a
   * broadcast literal per component, no shuffle, no UDF. */
  def transform(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val x = col(vecCol).cast("array<double>")
    model.basis.zipWithIndex.foldLeft(df) { case (acc, (b, j)) =>
      val offset = b.indices.map(i => b(i) * model.mean(i)).sum
      acc.withColumn(s"pc$j",
        Similarity.dotNative(x, lit(b)) - lit(offset))
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
   * (eigenvalues, eigenvector-COLUMN matrix). Deterministic sweep order,
   * converges quadratically; for d ≤ ~1k this is driver-side noise. */
  private[data] def jacobiEigen(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = a.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (offDiag() > 1e-20 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val mrp = m(r)(p); val mrq = m(r)(q)
              m(r)(p) = c * mrp - s * mrq
              m(r)(q) = s * mrp + c * mrq
              r += 1
            }
            r = 0
            while (r < d) {
              val mpr = m(p)(r); val mqr = m(q)(r)
              m(p)(r) = c * mpr - s * mqr
              m(q)(r) = s * mpr + c * mqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }
}
