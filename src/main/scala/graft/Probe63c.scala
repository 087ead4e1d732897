package graft

import org.apache.spark.sql.SparkSession

/** Evidence generator for the q63c singleton-group pruning
 * (Dedup.duplicateSpansExact): per prefix-doubling round, how many
 * positions stay live (rank group size ≥ 2) vs get pruned (singleton
 * group = corpus-unique substring, provably outside every duplicate
 * k-gram). The SCALING.md survivor-fraction table is generated here;
 * not part of the shipped surface. */
object Probe63c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = if (args.length > 1) args(1).toInt else 30
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val starts = scala.collection.mutable.HashMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts(j.jobId) = j.time
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs += ((j.jobId, j.time - starts.getOrElse(j.jobId, j.time)))
      })
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val t0 = System.nanoTime()
    val n = graft.data.Dedup.duplicateSpansExact(docs, "doc_id", "text",
        k = k, roundStats = Some((r, live, pruned) =>
          stats += ((r, live, pruned))))
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    println(jobs.map { case (id, ms) => s"job$id=${ms}ms" }.mkString(" "))
    println(f"dir=$dir spans=$n%d wall=$sec%.2f s")
    var prevLive = -1L
    val seedW = math.min(32, k)
    stats.foreach { case (r, live, pruned) =>
      val in = live + pruned
      // k <= 32 (direct tier): one stage, the hash prefilter. k > 32:
      // stage 0 = hash prefilter, 1 = literal seed relabel, 2+ = doubling
      val name =
        if (r == 0) s"hash-prefilter($seedW)"
        else if (r == 1) s"seed($seedW)"
        else s"double->${seedW << (r - 1)}"
      val ofPrev = if (prevLive < 0) "" else f" (${100.0 * in / prevLive}%.1f%% of prior live)"
      println(f"round $r%d [$name%-12s] in=$in%,12d live=$live%,12d " +
        f"pruned=$pruned%,12d survive=${100.0 * live / math.max(in, 1)}%5.1f%%$ofPrev")
      prevLive = live
    }
  }
}
