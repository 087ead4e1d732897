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

  /**
   * TRUE Hilbert-curve key (Skilling's transform — see
   * `plans.HilbertIndexExpr`): consecutive key values are always grid
   * NEIGHBORS, where the Morton interleave ([[zorderKey]]) jumps across
   * half the space at power-of-two boundaries — so range-partitioned
   * files cover compact d-dimensional blobs and every dimension prunes
   * a bit harder (this is the curve Delta/Iceberg OPTIMIZE actually
   * cluster by). Same normalization contract as [[zorderKey]]: the low
   * `bits` bits of each dimension participate via `pmod`.
   */
  def hilbertKey(dims: Seq[Column], bits: Int = 8): Column = {
    require(dims.nonEmpty && dims.size <= 6, s"1..6 dims, got ${dims.size}")
    require(bits * dims.size <= 62, s"bits*dims must fit a long, got $bits*${dims.size}")
    call_function("hilbert_index",
      array(dims.map(c => pmod(c.cast("long"), lit(1L << bits))): _*),
      lit(bits))
  }

  /** Clustered parquet write ordered by the Hilbert key of `dims`. */
  def writeHilbertOrdered(df: DataFrame, path: String, dims: Seq[String],
      numFiles: Int = 20, bits: Int = 8): Unit = {
    val hc = "__hilbert"
    df.withColumn(hc, hilbertKey(dims.map(col), bits))
      .repartitionByRange(numFiles, col(hc))
      .sortWithinPartitions(col(hc))
      .drop(hc)
      .write.mode("overwrite").parquet(path)
  }

  // ------------------------------------------- small-file compaction

  /**
   * Deterministic small-file COMPACTION PLAN — the OPTIMIZE/bin-packing
   * half of Delta's `OPTIMIZE` next to [[writeZOrdered]]'s ZORDER half.
   * Streaming ingest and per-partition writes leave thousands of
   * kilobyte parquet files whose per-file open/footer cost dominates
   * scans at scale; the fix is periodic rewrite into ~`targetBytes`
   * files.
   *
   * The plan is pure arithmetic over the file INVENTORY (one row per
   * file — metadata scale: 100 TB at 128 MB/file is under a million
   * rows, so the single global window here orders tiny metadata, never
   * data): files sort by path (keeping any path-embedded ordering —
   * dates, shards — physically adjacent), and each file's bucket is
   * `exclusive_prefix_sum(size) div targetBytes`. Consequences, all
   * exact: buckets are contiguous runs in path order; every bucket's
   * bytes land strictly within (targetBytes − maxFile, targetBytes +
   * maxFile) — the bucket boundary can shift by at most the file that
   * straddles it — except the last, which holds the remainder; a file
   * already ≥ targetBytes dominates its own bucket. The whole rule is
   * one window + one integer division — reproducible by any SQL engine,
   * so compaction plans can be audited cross-engine.
   */
  def compactionPlan(inventory: DataFrame, pathCol: String, sizeCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(pathCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    inventory
      .withColumn("__pre", coalesce(sum(col(sizeCol).cast("long")).over(w), lit(0L)))
      .withColumn("bucket", expr(s"__pre div ${targetBytes}L"))
      .drop("__pre")
  }

  /**
   * Execute a [[compactionPlan]] over a parquet directory: list files
   * (driver-side metadata listing, same scale bound as the plan), tag
   * every row with its source file, and rewrite with one partition per
   * plan bucket. Rows are joined to the broadcast plan on the unique
   * file NAME (part-UUID), so no path-encoding mismatch between the
   * filesystem listing and `input_file_name()` can mis-bucket a row.
   * Output file count ≤ number of plan buckets (hash partitioning may
   * merge two buckets into one file — content is unaffected). Returns
   * the plan for inspection/audit.
   */
  def compactSmallFiles(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String, targetBytes: Long): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inDir), spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
    require(files.nonEmpty, s"no parquet files to compact under $inDir")
    import spark.implicits._
    val plan = compactionPlan(files.toSeq.toDF("path", "size"),
      "path", "size", targetBytes)
    val nBuckets = (plan.agg(max(col("bucket"))).collect().head.getLong(0) + 1).toInt
    val fileName = regexp_extract(input_file_name(), "([^/]+)$", 1)
    spark.read.parquet(inDir)
      .withColumn("__file", fileName)
      .join(broadcast(plan.select(col("path").as("__file"), col("bucket"))),
        Seq("__file"))
      .repartition(nBuckets, col("bucket"))
      .drop("__file", "bucket")
      .write.mode("overwrite").parquet(outDir)
    plan
  }
}
