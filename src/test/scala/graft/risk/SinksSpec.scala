package graft.risk

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeClustered round-trips with files range-clustered on the key") {
    val dir = java.nio.file.Files.createTempDirectory("sinks").toString + "/t"
    val df = (1 to 10000).map(i => (i % 97, s"T${i % 13}", i.toDouble))
      .toDF("key", "ticker", "v")
    Sinks.writeClustered(df, dir, Seq("key", "ticker"), numFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.agg(sum($"v")).as[Double].head() == (1 to 10000).map(_.toDouble).sum)
    // range clustering: per-file key ranges must not overlap (file pruning works)
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min($"key").as("lo"), max($"key").as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
