package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`/`array<double>`):
 *
 *  - brute-force cosine top-k — the exact baseline. Plan: queries ⋈cross
 *    corpus with the (small) query side **broadcast**, so the corpus never
 *    shuffles; ranking is a per-query-partition window.
 *  - random-hyperplane **LSH** (sign-bucket) ANN — the scale path: one
 *    narrow projection to a bucket id, shuffle on the bucket int only,
 *    quadratic work confined to within-bucket candidates.
 *
 * Hyperplane coefficients are derived from MD5 (computed once, driver
 * side, embedded as literals) so an external SQL oracle can reproduce the
 * exact buckets — swap for Gaussian planes from a seeded RNG in
 * production.
 */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random coefficient in [-1, 1): MD5-derived so
   * any engine can re-generate it. */
  def planeCoef(plane: Int, dim: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${plane}_$dim".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(7)
    val h = java.lang.Long.parseLong(hex, 16)
    (h % 2001 - 1000) / 1000.0
  }

  /** `numPlanes` hyperplanes for `dim`-dimensional vectors. */
  def planes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim)(planeCoef)

  /** Sign-bucket id: bit p set iff dot(v, plane_p) >= 0. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = dot(v, array(p.map(lit): _*))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * Exact top-k cosine neighbors for each query vector (self excluded).
   * `queries` is expected to be small (it is broadcast); the corpus side
   * stays partition-local — no corpus shuffle, ranking shuffles only
   * (query_id, k) sized data.
   */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val rank = row_number().over(
      Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id")))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", rank)
      .filter(col("rank") <= k)
  }

  /** ANN top-k: candidates restricted to the query's LSH bucket. Same
   * output shape as [[bruteForceTopK]]; recall < 1 by construction. */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numPlanes: Int,
      dim: Int): DataFrame = {
    val ps = planes(numPlanes, dim)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), ps).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), ps).as("bucket"))
    val rank = row_number().over(
      Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("neighbor_id")))
    broadcast(q).join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      .withColumn("rank", rank)
      .filter(col("rank") <= k)
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup). Quadratic —
   * appropriate below ~10^4 rows per block; above that, pre-bucket with
   * [[lshBucket]] and run per bucket. */
  def cosineNearDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = vectors.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
