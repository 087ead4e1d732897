package graft.risk

import org.apache.spark.sql.DataFrame

/**
 * Batch sinks. The reference's only physical-layout op beyond
 * `repartition` is Delta `OPTIMIZE ZORDER BY (date, ticker)`
 * (`03_var_monte_carlo.py:162`) — pure data clustering for scan locality,
 * no semantics. The parquet equivalent: range-partition on the cluster
 * keys, sort within partitions, write — readers filtering on those keys
 * then prune files via parquet min/max row-group stats.
 */
object Sinks {

  /** ZORDER-approximating clustered parquet write. */
  def writeClustered(df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int = 20): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}
