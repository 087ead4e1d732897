package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: candidate counts before/after the q105 length-band
 * prune at a given SF dir (default sf0.1). Not part of the shipped
 * surface — evidence generator for SCALING.md. */
object Probe105 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cands = graft.data.Dedup.minhashNearDupsWithLen(
      docs, "doc_id", "text", threshold = 0.0)
    val agg = cands.agg(
      count(lit(1)).as("total"),
      sum(when(abs(col("len_a") - col("len_b")) > 500, 1L).otherwise(0L))
        .as("pruned")).collect()(0)
    println(s"PROBE105,total=${agg.getLong(0)},pruned_at_500=${agg.getLong(1)}")
    spark.stop()
  }
}
