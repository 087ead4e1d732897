package graft

import org.apache.spark.sql.SparkSession

/**
 * Timing harness for the incremental BPE trainer ([[graft.data.Bpe
 * .trainMerges]]) — the evidence behind SCALING.md's deep-ladder row:
 * ladder depth must cost driver microseconds per merge, not one Spark
 * job per merge (the [[graft.data.Bpe.trainMergesDistributed]] shape).
 * Prints `BPEBENCH,<nMerges>,<merges learned>,<seconds>` per depth; the
 * sf0.1 synthetic corpus has 31 word types, so ladders exhaust at 89
 * merges — depth beyond that is free, which is exactly the point.
 */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (n <- Seq(20, 500, 2000)) {
      val t0 = System.nanoTime()
      val m = graft.data.Bpe.trainMerges(docs, "text", n, minCount = 2L)
      println(f"BPEBENCH,$n,${m.size},${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
