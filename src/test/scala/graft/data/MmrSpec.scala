package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * MMR diversity rerank ([[Similarity.mmrRerank]]): the planted
 * redundant-pair case (diverse candidate overtakes the near-duplicate),
 * λ = 1 reduces to relevance order, k bounds, and determinism under
 * repartitioning.
 */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // q's candidates: two near-identical top hits + one slightly less
  // relevant but orthogonal hit
  private lazy val cands = Seq(
    (1L, 10L, 0.95, Array(1.0, 0.0)),
    (1L, 11L, 0.94, Array(0.999, 0.01)),  // near-dup of 10
    (1L, 12L, 0.80, Array(0.0, 1.0)))     // diverse
    .toDF("q", "id", "sim", "v")

  test("diverse candidate overtakes the near-duplicate at rank 2") {
    val got = Similarity.mmrRerank(cands, "q", "id", "sim", "v",
        lambda = 0.5, k = 3)
      .orderBy(col("rank")).select(col("id")).as[Long].collect().toList
    // rank 1: highest sim (10). rank 2: 11 scores .5·.94−.5·~1 ≈ −.03,
    // 12 scores .5·.80−.5·0 = .40 -> 12 wins. rank 3: 11.
    assert(got === List(10L, 12L, 11L))
  }

  test("lambda = 1 is pure relevance order") {
    val got = Similarity.mmrRerank(cands, "q", "id", "sim", "v", 1.0, 3)
      .orderBy(col("rank")).select(col("id")).as[Long].collect().toList
    assert(got === List(10L, 11L, 12L))
  }

  test("k bounds output; multiple queries stay independent") {
    val two = cands.union(Seq((2L, 20L, 0.9, Array(1.0, 0.0)),
      (2L, 21L, 0.1, Array(0.0, 1.0))).toDF("q", "id", "sim", "v"))
    val got = Similarity.mmrRerank(two, "q", "id", "sim", "v", 0.5, 2)
      .groupBy(col("q")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L))
  }

  test("deterministic under repartitioning (collect order irrelevant)") {
    def run(parts: Int) =
      Similarity.mmrRerank(cands.repartition(parts), "q", "id", "sim", "v",
          0.3, 3)
        .orderBy(col("rank"))
        .as[(Long, Int, Long, Double)].collect().toList
    assert(run(1) === run(5))
  }
}
