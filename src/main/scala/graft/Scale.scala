package graft

import org.apache.spark.sql.SparkSession

/**
 * Cross-scale-factor timing harness — the evidence generator behind
 * `SCALING.md`: runs each named query at sf0.001 / sf0.01 / sf0.1
 * (warmup pass, then min of 2 timed passes, the same steady-state
 * protocol as [[Bench]]) and prints one `SCALE,<query>,<sf>,<sec>` line
 * per measurement. A near-linear engine shows ~10× wall-clock per decade
 * once past fixed per-query overhead; anything strongly super-linear is
 * a scale bug the single-sf bench can't see.
 */
object Scale {
  def main(args: Array[String]): Unit = {
    // width + dirs overridable so the same harness produces the
    // two-width SF-1 table (VERDICT r12 task 7) — measurement harness
    // only, not the bench contract
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = sys.env.get("SPARK_GRAFT_SCALE_DIRS")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("sf0.001", "sf0.01", "sf0.1")
        .map(sf => s"/root/testdata/$sf"))
    val queries = if (args.nonEmpty) args.toSeq else Seq(
      "q63_dup_spans", "q57_corpus_prepare", "q29_dedup_clusters",
      "q29b_dedup_survivors", "q08_rolling_global_chunked",
      "q72_sql_surface", "q38_winnow", "q06_rolling_window")
    for (q <- queries; dir <- dirs) {
      val sf = new java.io.File(dir).getName
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup: file listing, codegen, JIT
      val t = math.min(once(), once())
      println(f"SCALE,$q,$sf,$t%.3f")
    }
    spark.stop()
  }
}
