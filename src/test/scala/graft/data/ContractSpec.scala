package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Data-contract checks ([[Contract.check]]): hand-counted violations,
 * null-rule-is-violation semantics, bounded evidence, empty input, and
 * the one-pass plan shape.
 */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, 10, Some("a")),
    (2L, -5, Some("b")),
    (3L, 200, None),
    (4L, 7, Some("d"))).toDF("id", "qty", "tag")

  test("hand-counted violations, ppm, and first-bad-id evidence") {
    val got = Contract.check(rows, col("id"), Seq(
        "qty_positive" -> (col("qty") > 0),
        "qty_small" -> (col("qty") < 100),
        "tag_present" -> col("tag").isNotNull))
      .orderBy(col("rule"))
      .as[(String, Long, Long, Long, Option[String])].collect().toList
    assert(got === List(
      ("qty_positive", 4L, 1L, 250000L, Some("2")),
      ("qty_small", 4L, 1L, 250000L, Some("3")),
      ("tag_present", 4L, 1L, 250000L, Some("3"))))
  }

  test("a null rule result counts as a violation (assertion semantics)") {
    // tag = null makes (tag === 'a') null, not false — still a violation
    val got = Contract.check(rows, col("id"),
        Seq("tag_is_a" -> (col("tag") === "a")))
      .select(col("n_violations")).as[Long].head()
    assert(got === 3L) // rows 2 (false), 3 (null), 4 (false)
  }

  test("clean rule reports zero with null evidence; empty input is all-zero") {
    val clean = Contract.check(rows, col("id"),
        Seq("id_positive" -> (col("id") > 0)))
      .as[(String, Long, Long, Long, Option[String])].head()
    assert(clean === (("id_positive", 4L, 0L, 0L, None)))
    val empty = Contract.check(rows.filter(col("id") < 0), col("id"),
        Seq("any" -> (col("qty") > 0)))
      .as[(String, Long, Long, Long, Option[String])].head()
    assert(empty === (("any", 0L, 0L, 0L, None)))
  }

  test("all rules evaluate in one aggregation pass") {
    val plan = Contract.check(rows, col("id"), Seq(
        "a" -> (col("qty") > 0), "b" -> (col("qty") < 100),
        "c" -> col("tag").isNotNull))
      .queryExecution.optimizedPlan.toString
    assert(plan.sliding("Aggregate".length).count(_ == "Aggregate") === 1, plan)
  }

  test("duplicate and quoted rule names rejected") {
    intercept[IllegalArgumentException] {
      Contract.check(rows, col("id"),
        Seq("a" -> lit(true), "a" -> lit(false)))
    }
    intercept[IllegalArgumentException] {
      Contract.check(rows, col("id"), Seq("bad'name" -> lit(true)))
    }
  }
}
