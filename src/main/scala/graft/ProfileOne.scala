package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query profile: wall seconds plus the job/stage/task/shuffle
  * breakdown the optimization round's evidence tables are built from
  * (guide §1: decide whether time goes to scheduling, shuffle, or
  * compute BEFORE touching the operator). Runs each named query twice
  * (warm + measured) at sf0.1 with the Bench session settings and
  * prints one summary line per query:
  *
  *   name wall_s jobs stages tasks shufRead_MB shufWrite_MB peakStage_s
  *
  * plus the top-3 stages by duration with their own shuffle volumes.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Long, Int)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val dur = (for { s <- si.submissionTime; e <- si.completionTime } yield e - s).getOrElse(0L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), dur,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          si.numTasks))
      }
    }

    for (q <- args) {
      val fn = SparkEntry.queries(q)
      // warmup (codegen + footer caches), untimed and unlistened
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$q WARMUP FAILED: ${e.getMessage}") }
      jobs = 0; stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$q FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async: give the completion events a moment
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq
      val sr = ss.map(_._4).sum / 1e6
      val sw = ss.map(_._5).sum / 1e6
      val nTasks = ss.map(_._6).sum
      val peak = if (ss.nonEmpty) ss.map(_._3).max / 1e3 else 0.0
      println(f"PROFILE $q%-28s wall=$wall%7.2fs jobs=$jobs%3d stages=${ss.size}%3d tasks=$nTasks%5d shufR=$sr%8.1fMB shufW=$sw%8.1fMB peakStage=$peak%6.2fs")
      for ((id, name, dur, r, w, nt) <- ss.sortBy(-_._3).take(5))
        println(f"    stage $id%4d ${dur / 1e3}%6.2fs tasks=$nt%4d shufR=${r / 1e6}%8.1fMB shufW=${w / 1e6}%8.1fMB  $name")
    }
    spark.stop()
  }
}
