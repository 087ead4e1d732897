package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Semantic decontamination ([[Similarity.contaminationReport]]): a planted
 * duplicate of a benchmark vector is flagged at sim 1.0, sub-threshold
 * docs are absent, argmax ties break toward the lower bench id, and the
 * benchmark side is broadcast (the corpus never shuffles).
 */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val e1 = Array(1.0, 0.0, 0.0)
  private val e2 = Array(0.0, 1.0, 0.0)
  private val mix = Array(1.0, 1.0, 0.0) // cos 1/√2 ≈ .707 to both

  private lazy val bench = Seq((100L, e1), (101L, e1), (102L, e2))
    .toDF("id", "v")
  private lazy val corpus = Seq(
    (1L, e1),                     // exact copy of bench 100 AND 101
    (2L, mix),                    // .707 to all three
    (3L, Array(0.0, 0.0, 1.0))).toDF("id", "v") // orthogonal: clean

  test("planted copy flagged at sim 1.0; tie breaks to lower bench id") {
    val got = Similarity.contaminationReport(corpus, bench, "id", "v", 0.9)
      .as[(Long, Long, Double)].collect().toList
    assert(got === List((1L, 100L, 1.0)))
  }

  test("threshold admits the mixture doc; argmax still deterministic") {
    val got = Similarity.contaminationReport(corpus, bench, "id", "v", 0.5)
      .orderBy(col("id"))
      .as[(Long, Long, Double)].collect().toList
    // doc 2 ties at .707071 across all three bench vectors -> bench 100
    assert(got.map(_._1) === List(1L, 2L))
    assert(got(1)._2 === 100L)
    assert(math.abs(got(1)._3 - 0.707107) < 1e-6)
  }

  test("bench side is broadcast; no corpus exchange") {
    val plan = Similarity.contaminationReport(corpus, bench, "id", "v", 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
