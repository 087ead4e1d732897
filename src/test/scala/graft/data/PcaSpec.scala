package graft.data

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // columns are orthonormal
    val dot01 = vecs(0)(0) * vecs(0)(1) + vecs(1)(0) * vecs(1)(1)
    assert(math.abs(dot01) < 1e-12)
  }

  private def planted(n: Int) = {
    // strong axis u (var ~9), weaker axis w (var ~1), tiny noise elsewhere
    val rnd = new scala.util.Random(42)
    val u = Array(0.6, 0.0, 0.8, 0.0, 0.0, 0.0)
    val w = Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    (0 until n).map { _ =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian()
      Array.tabulate(6)(i =>
        (a * u(i) + b * w(i) + rnd.nextGaussian() * 0.01 + 0.5).toFloat)
    }
  }

  test("fit recovers planted principal axes with descending eigenvalues") {
    val df = planted(4000).map(Tuple1(_)).toSeq.toDF("embedding")
    val m = Pca.fit(df, "embedding", k = 3)
    assert(m.n == 4000)
    // eigenvalues descending, first ~9, second ~1, third ~noise
    assert(m.eigenvalues(0) > m.eigenvalues(1) && m.eigenvalues(1) > m.eigenvalues(2))
    assert(math.abs(m.eigenvalues(0) - 9.0) < 1.0, m.eigenvalues(0).toString)
    assert(math.abs(m.eigenvalues(1) - 1.0) < 0.2, m.eigenvalues(1).toString)
    assert(m.eigenvalues(2) < 0.01)
    // top component aligns with the planted u axis
    val u = Array(0.6, 0.0, 0.8, 0.0, 0.0, 0.0)
    val cos = m.basis(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, cos.toString)
    // sign convention: largest-|coordinate| entry is positive
    assert(m.basis.forall(b => b(b.indices.maxBy(i => math.abs(b(i)))) > 0))
  }

  test("fitSampled basis matches the full-fit basis on low-rank data") {
    val df = planted(4000).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("id", "embedding")
    val full = Pca.fit(df, "embedding", k = 2)
    // 30% hash-sample: still ~1200 rows >> the 2 planted axes
    val sampled = Pca.fitSampled(df, "embedding", k = 2, key = $"id", num = 3000)
    assert(sampled.n < full.n && sampled.n > 800, s"sample size ${sampled.n}")
    // principal angles: |cos| between corresponding components near 1
    sampled.basis.zip(full.basis).zipWithIndex.foreach { case ((s, f), c) =>
      val cos = s.zip(f).map { case (a, b) => a * b }.sum
      assert(math.abs(cos) > 0.99, s"component $c principal angle too wide: cos=$cos")
    }
    // determinism: same call -> identical model
    val again = Pca.fitSampled(df, "embedding", k = 2, key = $"id", num = 3000)
    assert(again.basis.map(_.toSeq).toSeq == sampled.basis.map(_.toSeq).toSeq)
  }

  test("fit fails fast on NaN/Inf components instead of corrupting moments") {
    val bad = Seq(Tuple1(Array(1.0f, Float.NaN, 0.5f)),
      Tuple1(Array(0.1f, 0.2f, 0.3f))).toDF("embedding")
    val e = intercept[org.apache.spark.SparkException] {
      Pca.fit(bad, "embedding", k = 1)
    }
    assert(e.getMessage != null)
  }

  test("fit is bit-deterministic across partitionings; projection centered") {
    val data = planted(1500).map(Tuple1(_)).toSeq
    val m1 = Pca.fit(data.toDF("embedding").repartition(1), "embedding", 2)
    val m13 = Pca.fit(data.toDF("embedding").repartition(13), "embedding", 2)
    assert(m1.mean.toSeq == m13.mean.toSeq)          // exact, not approximate
    assert(m1.eigenvalues.toSeq == m13.eigenvalues.toSeq)
    assert(m1.basis.map(_.toSeq).toSeq == m13.basis.map(_.toSeq).toSeq)
    // projections: mean ~0 per component, var(pc0) ~ eigenvalue(0)
    val proj = Pca.transform(data.toDF("embedding").repartition(7), "embedding", m1)
    val stats = proj.agg(avg($"pc0"), variance($"pc0"), avg($"pc1"))
      .as[(Double, Double, Double)].head()
    assert(math.abs(stats._1) < 1e-6)
    assert(math.abs(stats._2 - m1.eigenvalues(0)) / m1.eigenvalues(0) < 0.01)
    assert(math.abs(stats._3) < 1e-6)
  }
}
