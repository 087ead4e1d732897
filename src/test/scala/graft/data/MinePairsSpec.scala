package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Contrastive pair mining ([[Similarity.minePairs]]): planted positives
 * and hard negatives land in their bands, out-of-band and cross-cell
 * pairs are absent, and the band contract rejects overlapping ranges.
 */
class MinePairsSpec extends SparkSpec {
  import spark.implicits._

  private val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
  // cell 0: near-dup pair (1,2), hard-neg pair (1,3)/(2,3); cell 1: id 4
  private lazy val vecs = Seq(
    (1L, Array(1.0, 0.0)),
    (2L, Array(0.999, 0.02)),   // cos to 1 ≈ .9998 -> pos
    (3L, Array(0.8, 0.55)),     // cos to 1 ≈ .824 -> hard_neg band below
    (4L, Array(0.1, 2.0))).toDF("id", "v")

  test("planted pos and hard-neg pairs with band labels") {
    val got = Similarity.minePairs(vecs, "id", "v", cents,
        posThreshold = 0.95, negLo = 0.5, negHi = 0.9)
      .select(col("id_a"), col("id_b"), col("pair_type"))
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 2L, "pos"), (1L, 3L, "hard_neg"),
      (2L, 3L, "hard_neg")))
  }

  test("cross-cell pairs never surface, even at threshold 0") {
    val got = Similarity.minePairs(vecs, "id", "v", cents,
        posThreshold = 0.0, negLo = -1.0, negHi = -0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    assert(!got.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("pairs between bands (negHi <= sim < posThreshold) are dropped") {
    val got = Similarity.minePairs(vecs, "id", "v", cents,
        posThreshold = 0.99, negLo = 0.1, negHi = 0.5)
      .select(col("id_a"), col("id_b"), col("pair_type"))
      .as[(Long, Long, String)].collect().toSet
    // (1,3)/(2,3) at ~.82 fall in the dead zone between .5 and .99
    assert(got === Set((1L, 2L, "pos")))
  }

  test("overlapping bands rejected loudly") {
    intercept[IllegalArgumentException] {
      Similarity.minePairs(vecs, "id", "v", cents, 0.5, 0.2, 0.8)
    }
  }
}
