package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Prototype pruning ([[Similarity.prototypePrune]]): within each cell the
 * most centroid-similar vectors are dropped, exactly ceil(n·frac) of
 * them, deterministically; frac 0 and 1 are the identity and empty-set
 * edges.
 */
class PrototypePruneSpec extends SparkSpec {
  import spark.implicits._

  // two axis-aligned centroids; vectors with decreasing cosine to cent 0
  private val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
  private lazy val vecs = Seq(
    (1L, Array(10.0, 0.0)),  // cos 1.0 to cent 0 — most prototypical
    (2L, Array(10.0, 1.0)),  // cos .995
    (3L, Array(10.0, 5.0)),  // cos .894
    (4L, Array(0.0, 3.0)),   // cell 1, cos 1.0
    (5L, Array(1.0, 3.0))).toDF("id", "v") // cell 1, cos .949

  test("drops exactly ceil(n·frac) most-prototypical per cell") {
    val got = Similarity.prototypePrune(vecs, "id", "v", cents, dropFrac = 0.4)
      .orderBy(col("id"))
      .as[(Long, Long, Double, Boolean)].collect().toList
    // cell 0 has n=3 -> ceil(1.2)=2 dropped (ids 1,2); cell 1 n=2 -> 1 (id 4)
    assert(got.map(r => r._1 -> r._4) ===
      List(1L -> false, 2L -> false, 3L -> true, 4L -> false, 5L -> true))
    assert(got.map(_._2) === List(0L, 0L, 0L, 1L, 1L))
    assert(got.head._3 === 1.0) // true cosine, not a dot product
  }

  test("dropFrac 0 keeps everything, 1 drops everything") {
    val all = Similarity.prototypePrune(vecs, "id", "v", cents, 0.0)
      .filter(col("kept")).count()
    val none = Similarity.prototypePrune(vecs, "id", "v", cents, 1.0)
      .filter(col("kept")).count()
    assert(all === 5L && none === 0L)
  }

  test("rank ties break toward the lower id") {
    val dup = Seq((7L, Array(2.0, 0.0)), (8L, Array(4.0, 0.0))).toDF("id", "v")
    val got = Similarity.prototypePrune(dup, "id", "v", cents, 0.5)
      .orderBy(col("id")).as[(Long, Long, Double, Boolean)].collect().toList
    // both cos 1.0 to cent 0: id 7 ranks first, so it is the one dropped
    assert(got.map(r => r._1 -> r._4) === List(7L -> false, 8L -> true))
  }
}
