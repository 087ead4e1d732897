package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Per-dimension embedding stats ([[Similarity.dimensionStats]]):
 * hand-computed values on a tiny matrix, dead-dimension and scale-blow-up
 * detection (the operator's reason to exist), and the one-pass plan
 * shape (the generator unnests ONE aggregated row, not the corpus).
 */
class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  // 3 vectors × 2 dims: dim0 = {1, 2, 3}, dim1 = {4, 4, 4} (dead)
  private lazy val vecs = Seq(
    (1L, Array(1.0, 4.0)),
    (2L, Array(2.0, 4.0)),
    (3L, Array(3.0, 4.0))).toDF("id", "v")

  test("hand-computed stats per dimension") {
    val got = Similarity.dimensionStats(vecs, "v")
      .orderBy(col("dim"))
      .select(col("dim"), col("n"), col("sum_v"), col("mean"), col("min_v"),
        col("max_v"), col("std"))
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect()
    assert(got(0) === ((0L, 3L, 6.0, 2.0, 1.0, 3.0, 1.0)))
    // dead dimension: zero variance, mean = value
    assert(got(1) === ((1L, 3L, 12.0, 4.0, 4.0, 4.0, 0.0)))
  }

  test("a scale blow-up in one dimension is visible in max/std") {
    val poisoned = vecs.union(Seq((4L, Array(1000.0, 4.0))).toDF("id", "v"))
    val d0 = Similarity.dimensionStats(poisoned, "v")
      .filter(col("dim") === 0).select(col("max_v"), col("std"))
      .as[(Double, Double)].head()
    assert(d0._1 === 1000.0)
    assert(d0._2 > 400.0)
  }

  test("standardize: hand-checked z-scores, dead dimension maps to 0") {
    val got = Similarity.standardize(vecs, "id", "v")
      .orderBy(col("id")).select(col("z")).as[Seq[Double]].collect()
    // dim0 = {1,2,3}: mean 2, sd 1 -> z = -1, 0, 1; dim1 dead -> 0
    assert(got(0) === Seq(-1.0, 0.0))
    assert(got(1) === Seq(0.0, 0.0))
    assert(got(2) === Seq(1.0, 0.0))
  }

  test("standardized output has per-dim mean 0 and sample sd 1 (live dims)") {
    val rng = new scala.util.Random(3)
    val data = (1L to 40L).map(i => (i, Array.fill(4)(rng.nextGaussian() * 5)))
      .toDF("id", "v")
    val zs = Similarity.standardize(data, "id", "v")
      .select(col("z")).as[Seq[Double]].collect()
    for (d <- 0 until 4) {
      val xs = zs.map(_(d))
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      assert(math.abs(m) < 1e-5, s"dim $d mean $m")
      assert(math.abs(sd - 1.0) < 1e-5, s"dim $d sd $sd")
    }
  }

  test("one aggregation pass: the generator unnests the 1-row aggregate, not the corpus") {
    val plan = Similarity.dimensionStats(vecs, "v")
      .queryExecution.optimizedPlan.toString
    // exactly one Aggregate (both Summarizer metrics fused into it), and
    // the Generate sits ABOVE it (unnesting dim-length arrays of one row)
    assert("(?s)Generate.*Aggregate".r.findFirstIn(plan).isDefined, plan)
    assert(plan.sliding("Aggregate".length).count(_ == "Aggregate") === 1, plan)
  }

  test("ivfBalanceReport: exact occupancy, empty cells present, shares sum") {
    val rnd = new scala.util.Random(4)
    val vs = Seq.tabulate(40)(i => (i.toLong, Array.fill(8)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
    val cents = Similarity.planes(6, 8)
    val got = Similarity.ivfBalanceReport(vs, "v", cents)
      .select(col("cell"), col("n_vecs"), col("share_ppm"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === (0L until 6L))
    assert(got.map(_._2).sum === 40L)
    // brute-force assignment reference (ties toward higher cell id)
    val data = vs.as[(Long, Array[Double])].collect()
    val want = data.groupBy { case (_, v) =>
      (0 until 6).map(c => (v.zip(cents(c)).map(p => p._1 * p._2).sum, c))
        .maxBy { case (s, c) => (s, c) }._2.toLong
    }.view.mapValues(_.length.toLong).toMap
    got.foreach { case (cell, n, ppm) =>
      assert(n === want.getOrElse(cell, 0L), s"cell $cell")
      assert(ppm === n * 1000000L / 40L)
    }
  }
}
