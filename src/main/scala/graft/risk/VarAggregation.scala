package graft.risk

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * On-demand VaR aggregation — reference `04_var_aggregation.py`: weight
 * each instrument's 32,000-trial return vector, element-wise-sum vectors
 * by (date [, country | industry]), then extract the interpolated
 * percentile.
 *
 * The vector sum is `ml.stat.Summarizer.sum` (same class the reference
 * uses from Python, `04_var_aggregation.py:33-41`) — a real partial
 * aggregate: map-side combine of dense vectors, one shuffle of ONE vector
 * per group per partition. [[VectorSumAggregator]] is the
 * Summarizer-independent fallback with identical merge semantics.
 */
object VarAggregation {

  /** trials ⋈ portfolio (broadcast; 27 rows in the reference) + per-row
   * weighted vector — `04_var_aggregation.py:13-18`. */
  def weightedTrials(
      trials: DataFrame,
      portfolio: DataFrame,
      tickerCol: String = "ticker",
      returnsCol: String = "returns",
      weightCol: String = "weight"): DataFrame = {
    trials
      .join(broadcast(portfolio), Seq(tickerCol))
      .withColumn("weighted_returns",
        functions.weightedVector(col(returnsCol), col(weightCol)))
  }

  /**
   * VaR (and ES) by group: element-wise vector sum of weighted trial
   * vectors per group -> interpolated percentile at (100 - confidence).
   * `groupCols` = date / date+country / date+industry
   * (`04_var_aggregation.py:56-123`).
   */
  def varByGroup(
      weighted: DataFrame,
      groupCols: Seq[String],
      confidence: Double = 99,
      withShortfall: Boolean = false): DataFrame = {
    val summed = weighted
      .groupBy(groupCols.map(col): _*)
      .agg(Summarizer.sum(col("weighted_returns")).as("simulations"))
    val withVar = summed.withColumn(s"var_${confidence.toInt}",
      functions.varAtVec(col("simulations"), lit(confidence)))
    val out =
      if (withShortfall)
        withVar.withColumn(s"es_${confidence.toInt}",
          functions.shortfallAtVec(col("simulations"), lit(confidence)))
      else withVar
    out.drop("simulations")
  }

  /** Risk contribution crosstab — `04_var_aggregation.py:127-131`: pivot a
   * slice column's VaR into columns and normalize each row to sum 1. */
  def riskContribution(
      varBySlice: DataFrame,
      dateCol: String,
      sliceCol: String,
      varCol: String,
      sliceValues: Seq[String]): DataFrame = {
    val pivoted = varBySlice
      .groupBy(col(dateCol))
      .pivot(sliceCol, sliceValues)
      .agg(first(col(varCol)))
    val total = sliceValues.map(col).reduce(_ + _)
    // one projection: a foldLeft of withColumn(c, c/total) would rebind
    // `total` to already-normalized columns after the first iteration
    pivoted.select(col(dateCol) +: sliceValues.map(c => (col(c) / total).as(c)): _*)
  }
}

/**
 * Summarizer-independent element-wise vector-sum `Aggregator` — the only
 * "custom Catalyst" piece parity needs (SURVEY §4): a typed aggregate with
 * true partial aggregation (map-side combine) over `ml.linalg.Vector`.
 * Usable as `udaf(VectorSumAggregator)` in SQL or `.agg(vectorSum(...))`.
 */
object VectorSumAggregator extends Aggregator[Vector, Array[Double], Vector] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(buf: Array[Double], v: Vector): Array[Double] =
    if (buf.isEmpty) v.toArray
    else {
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  override def finish(buf: Array[Double]): Vector = Vectors.dense(buf)
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Vector] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector]()
}
