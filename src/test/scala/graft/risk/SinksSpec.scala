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

  test("zorderKey interleaves bits; locality beats lexicographic on dim 2") {
    import graft.risk.{Sinks => S}
    // hand-checked interleave: x=0b11 (bits->positions 0,2), y=0b10 (->3)
    val r = Seq((3L, 2L)).toDF("x", "y")
      .select(S.zorderKey(Seq($"x", $"y"), bits = 2)).as[Long].head()
    assert(r == ((1L << 0) | (1L << 2) | (1L << 3))) // = 13
    // z-sorted layout: a filter on EITHER dimension touches few files
    val n = 4096
    val grid = (0 until n).map(i => (i % 64, i / 64, i)).toDF("a", "b", "v")
    val dir = java.nio.file.Files.createTempDirectory("sinks_z").toString + "/t"
    S.writeZOrdered(grid, dir, Seq("a", "b"), numFiles = 16, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() == n)
    def filesTouched(c: String) = back.filter(col(c) === 7)
      .select(input_file_name()).distinct().count()
    // 16 files over a 64x64 z-curve: one value of either dim spans ~4
    // files (sqrt locality), never all 16 as a lexicographic sort on
    // (a,b) would for a filter on b
    assert(filesTouched("a") <= 8, s"a: ${filesTouched("a")}")
    assert(filesTouched("b") <= 8, s"b: ${filesTouched("b")}")
  }
}
