package graft.risk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Batch sinks. The reference's only physical-layout op beyond
 * `repartition` is Delta `OPTIMIZE ZORDER BY (date, ticker)`
 * (`03_var_monte_carlo.py:162`) — pure data clustering for scan locality,
 * no semantics. The parquet equivalent: range-partition on the cluster
 * keys, sort within partitions, write — readers filtering on those keys
 * then prune files via parquet min/max row-group stats.
 */
object Sinks {

  /** ZORDER-approximating clustered parquet write. Lexicographic: prunes
   * hard on the FIRST cluster key, progressively less on later ones. For
   * balanced multi-dimensional pruning use [[writeZOrdered]]. */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int = 20): Unit = {
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /**
   * True z-order (Morton) key: interleave the low `bits` bits of each
   * dimension round-robin, so rows sorted by the key stay clustered in
   * EVERY dimension at once — a filter on any single dimension prunes
   * ~file-count^(1/d) of the files instead of only the lead column.
   *
   * Callers normalize each dimension to a small non-negative int first
   * (pmod of a key, a date bucket, a rank); only the low `bits` bits
   * participate. Pure shift/mask arithmetic (codegen'd, engine-portable —
   * a SQL oracle reproduces it with `>> & <<`).
   */
  def zorderKey(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && dims.size <= 4, s"1..4 dims, got ${dims.size}")
    require(bits * dims.size <= 60, s"bits*dims must fit a long, got $bits*${dims.size}")
    val d = dims.size
    dims.zipWithIndex.map { case (c, i) =>
      val v = pmod(c.cast("long"), lit(1L << bits))
      (0 until bits).map { b =>
        // bit b of dim i lands at interleaved position b*d + i
        (shiftrightunsigned(v, b) % 2) * lit(1L << (b * d + i))
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** Clustered parquet write ordered by the z-order key of `dims`. */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
      numFiles: Int = 20, bits: Int = 16): Unit = {
    val zc = "__zorder"
    df.withColumn(zc, zorderKey(dims.map(col), bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
