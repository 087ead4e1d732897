package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup pass: JIT + codegen compilation + parquet footer
    // caches; reported numbers are steady-state per-query times
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // MEMORY_AND_DISK blocks of the shared trials cache that were evicted
    // during the warmup sweep would land their rebuild cost on whichever MC
    // query the timed loop hits first (r3: q35 read 16.8s vs 3.3s steady) —
    // re-materialize the cache immediately before timing
    try graft.risk.VarPipeline.sharedTrials(spark, SparkEntry.miniCfg)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // a failing query must surface as an "err" entry in the JSON, never as
    // a silent ~0s time that reads as a speedup
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    // (seconds, succeeded) per query — a failed attempt's (fast) abort
    // time must never enter the min below, or a transient pass-2 failure
    // reads as a phantom speedup
    def timedPass(): Map[String, (Double, Boolean)] =
      SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // noop sink: forces every output column to be computed (a count()
        // would let the optimizer prune aggregate/projection work)
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\n\r\t]", " ").take(200)
              false
          }
        name -> ((System.nanoTime() - t0) / 1e9, ok)
      }
    // two timed passes, report per-query min OVER SUCCESSFUL PASSES: the
    // host carries external load spikes (observed 45-305s spread on
    // identical runs), so a single pass misattributes noise to plans;
    // min-of-2 approximates steady-state
    val pass1 = timedPass()
    val pass2 = timedPass()
    val results = pass1.map { case (k, (t1, ok1)) =>
      val (t2, ok2) = pass2(k)
      k -> ((ok1, ok2) match {
        case (true, true) => math.min(t1, t2)
        case (true, false) => t1
        case (false, true) => t2
        case _ => math.max(t1, t2) // both failed: report the slower abort
      })
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_err":${errs.size},"errors":$es,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
