package graft.risk

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrialVectorSpec extends SparkSpec {
  import spark.implicits._

  test("TrialVectorAggregator == sort_array/collect_list/UDF composable twin") {
    val rnd = new scala.util.Random(11)
    val rows = for {
      d <- 1 to 3; t <- Seq("A", "B"); trial <- 0 until 257
    } yield (java.sql.Timestamp.valueOf(f"2024-01-0$d 00:00:00"), t,
      trial.toLong, rnd.nextDouble() - 0.5)
    // shuffle row order so ids arrive unordered (exercises growth + merge)
    val df = rnd.shuffle(rows).toDF("date", "ticker", "trial_id", "return")
      .repartition(7)
    def collect(res: org.apache.spark.sql.DataFrame) =
      res.select(col("date").cast("string"), col("ticker"), col("returns"))
        .collect()
        .map(r => (r.getString(0), r.getString(1),
          r.getAs[org.apache.spark.ml.linalg.Vector](2)))
        .sortBy(x => (x._1, x._2))
    val fast = collect(MonteCarlo.collectTrialVectors(df))
    val slow = collect(MonteCarlo.collectTrialVectorsComposable(df))
    assert(fast.length == slow.length && fast.length == 6)
    fast.zip(slow).foreach { case ((d1, t1, v1), (d2, t2, v2)) =>
      assert(d1 == d2 && t1 == t2)
      assert(v1.size == 257 && v1 == v2)
    }
  }

  test("fused predict_nonlinear == composable predictLinear, bit-exact") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map { i =>
      (s"T${i % 4}", Array.fill(5)(rnd.nextDouble() * 4 - 2))
    }
    val df = rows.toDF("ticker", "features")
    val weights = (0 to 3).map(i => (s"T$i", Array.fill(21)(rnd.nextDouble() - 0.5)))
      .toDF("ticker", "weights")
    val fused = Training.score(df, weights, outCol = "p")
      .select(col("ticker"), col("features"), col("p")).collect()
      .map(r => (r.getString(0), r.getSeq[Double](1), r.getDouble(2))).sortBy(x => (x._1, x._2.head))
    val comp = Training.scoreComposable(df, weights, outCol = "p")
      .select(col("ticker"), col("features"), col("p")).collect()
      .map(r => (r.getString(0), r.getSeq[Double](1), r.getDouble(2))).sortBy(x => (x._1, x._2.head))
    assert(fused.length == comp.length)
    fused.zip(comp).foreach { case ((t1, _, p1), (t2, _, p2)) =>
      assert(t1 == t2)
      assert(java.lang.Double.doubleToLongBits(p1) == java.lang.Double.doubleToLongBits(p2),
        s"$t1: $p1 != $p2")
    }
  }
}