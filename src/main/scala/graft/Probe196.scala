package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Evidence generator for the q196 hash pre-aggregation design
 * (Dedup.topDuplicateSubstrings):
 *  - the bucket-count histogram that REFUTES top-M certification (the
 *    top of the distribution is a tie plateau — every k-window of a
 *    duplicated passage ties at the passage count, so no fixed margin
 *    separates);
 *  - measured shuffle bytes + wall for the literal single-agg plan vs
 *    the exact-cutoff plan. Not part of the shipped surface. */
object Probe196 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = 30
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null)
            shuffleWrite.addAndGet(
              t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def measure(name: String)(body: => Long): Unit = {
      shuffleWrite.set(0L)
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(f"$name%-18s rows=$n%4d wall=$sec%6.2f s " +
        f"shuffleWrite=${shuffleWrite.get / 1048576.0}%8.2f MiB")
    }

    val pos = docs.select(col("doc_id"),
        graft.data.TextFunctions.normalizeText(col("text")).as("t"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .filter(length(col("t")) >= k)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")) - lit(k - 1))).as("p"),
        col("t"))
      .select(col("doc_id"), col("t").substr(col("p"), lit(k)).as("sub"))
      .localCheckpoint()

    val hist = pos.select(xxhash64(col("sub")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("bc")).filter(col("bc") >= 2)
      .groupBy(col("bc")).agg(count(lit(1)).as("n"))
      .orderBy(col("bc").desc).collect()
    println("bucket-count histogram (bc -> n_buckets): " +
      hist.map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString(", "))

    measure("literal single-agg") {
      pos.groupBy(col("sub"))
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_occurrences") >= 2)
        .orderBy(col("n_occurrences").desc, col("sub")).limit(20).count()
    }
    measure("exact-cutoff") {
      graft.data.Dedup.topDuplicateSubstrings(
        docs, "doc_id", "text", k = k, topN = 20).count()
    }
  }
}
