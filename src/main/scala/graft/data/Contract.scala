package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-contract checks — the assertion gate a pipeline runs where data
 * changes hands (ingest, post-transform, pre-release): declarative
 * per-row rules, one report row per rule with exact violation counts,
 * integer-ppm rates, and the first violating id as evidence. The
 * "expectations" pattern (Great Expectations / dbt tests / Deequ),
 * Spark-first.
 *
 * Scale shape: ALL rules evaluate in ONE aggregation pass — each rule
 * contributes a conditional-sum cell and a min-id cell to the same
 * map-side-combinable aggregate, and the 1-row result unpivots via
 * `stack` (the [[Corpus.corpusCard]] trick), so checking 30 rules costs
 * one corpus scan, not 30. Evidence is BOUNDED by construction (`min`
 * of the violating ids — no collect_list of a possibly-huge violation
 * set); a null rule result (e.g. a comparison over a null column)
 * counts as a VIOLATION, matching the assertion reading "the rule did
 * not hold".
 */
object Contract {

  /**
   * Evaluate `rules` (name → boolean Column over the input's columns)
   * in one pass. Output per rule: `rule, n_rows, n_violations,
   * violation_ppm` (`n_violations·1e6 div n_rows`, 0 for an empty
   * input), `first_bad_id` (min violating id, null when clean).
   */
  def check(df: DataFrame, idCol: Column,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_._1)}")
    require(rules.forall(r => !r._1.contains("'")),
      "rule names must not contain single quotes (they embed in a stack())")
    val aggs = rules.zipWithIndex.flatMap { case ((_, rule), i) =>
      val bad = !coalesce(rule, lit(false))
      Seq(
        coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(s"__v$i"),
        min(when(bad, idCol)).cast("string").as(s"__b$i"))
    } :+ count(lit(1)).as("__n")
    val stacked = rules.indices.map(i =>
      s"'${rules(i)._1}', __v$i, __b$i").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), expr(
        s"stack(${rules.size}, $stacked) AS (rule, n_violations, first_bad_id)"))
      .select(col("rule"), col("__n").as("n_rows"), col("n_violations"),
        when(col("__n") === 0L, lit(0L))
          .otherwise(expr("n_violations * 1000000 div __n")).as("violation_ppm"),
        col("first_bad_id"))
  }
}
