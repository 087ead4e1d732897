package graft
import org.apache.spark.sql.SparkSession

/** Plan diagnosis harness (evidence generator, not part of the shipped
  * surface): for each named query, list the initial physical plan's
  * shuffle exchanges and report which pairs canonicalize EQUAL (AQE will
  * materialize those once and reuse the stage) vs merely similar — the
  * first line of the canonicalized diff is printed for near-misses.
  * Used to verify exchange-reuse claims in OPTIMIZATION_r13.md. */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q")
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val exs = exec.collect { case e: ShuffleExchangeExec => e }
      println(s"n_exchanges=${exs.length}")
      val canon = exs.map(_.canonicalized.toString)
      exs.zipWithIndex.foreach { case (e, i) =>
        println(s"  ex$i: ${e.outputPartitioning}") }
      for (i <- exs.indices; j <- (i + 1) until exs.length) {
        val eq = exs(i).canonicalized == exs(j).canonicalized
        val l0 = canon(i).linesIterator.toSeq
        val l1 = canon(j).linesIterator.toSeq
        // only report pairs that are equal or nearly so (same depth)
        if (eq) println(s"  ex$i == ex$j (stage will be reused)")
        else if (l0.length == l1.length && l0.length > 2) {
          val diff = l0.zip(l1).filter(p => p._1 != p._2)
          if (diff.length <= 3 && diff.nonEmpty) {
            println(s"  ex$i ~~ ex$j NEAR-MISS, first diff:")
            println("    A: " + diff.head._1.trim.take(220))
            println("    B: " + diff.head._2.trim.take(220))
          }
        }
      }
    }
    spark.stop()
  }
}
