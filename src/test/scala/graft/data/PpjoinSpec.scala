package graft.data

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Prefix-filtered exact set-similarity join ([[Dedup.jaccardThresholdPairs]]):
 * the candidate prefix join must lose NOTHING — output is pair-for-pair,
 * value-for-value identical to the quadratic brute force, at both unigram
 * and shingle granularity, across thresholds.
 */
class PpjoinSpec extends SparkSpec {
  import spark.implicits._

  // seeded corpus: clusters of perturbed near-dups + singletons over a
  // small vocabulary (worst case for prefix filtering: heavy overlap)
  private lazy val docs = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def sent(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val bases = Seq.tabulate(8)(i => (i.toLong, sent(12 + rnd.nextInt(8))))
    val dups = bases.take(4).map { case (i, s) =>
      val toks = s.split(" ")
      val k = rnd.nextInt(toks.length)
      (100L + i, toks.updated(k, vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val edge = Seq((200L, ""), (201L, "one"), (202L, "two words"))
    (bases ++ dups ++ edge).toDF("doc_id", "text")
  }

  /** Quadratic ground truth with the same (hashed) units and threshold
   * arithmetic — spelled via the COMPOSABLE hash twins, so this also
   * pins native-kernel/composable equivalence. */
  private def brute(thresholdPpm: Long, shingleN: Int): Set[(Long, Long, Long)] = {
    val units =
      if (shingleN <= 1)
        array_distinct(transform(TextFunctions.tokens(col("text")),
          t => TextFunctions.hash28(t)))
      else Dedup.shingleHashesComposable(col("text"), shingleN)
    val sets = docs.select(col("doc_id").as("id"), units.as("t"))
      .filter(size(col("t")) > 0)
    val a = sets.select(col("id").as("id_a"), col("t").as("t_a"))
    val b = sets.select(col("id").as("id_b"), col("t").as("t_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("i", size(array_intersect(col("t_a"), col("t_b"))).cast("long"))
      .withColumn("u", size(col("t_a")).cast("long") + size(col("t_b")) - col("i"))
      .select(col("id_a"), col("id_b"), expr("i * 1000000 div u").as("j"))
      .filter(col("j") >= thresholdPpm)
      .as[(Long, Long, Long)].collect().toSet
  }

  private def got(thresholdPpm: Long, shingleN: Int): Set[(Long, Long, Long)] =
    Dedup.jaccardThresholdPairs(docs, "doc_id", "text", thresholdPpm, shingleN)
      .as[(Long, Long, Long)].collect().toSet

  test("identical to brute force across thresholds (unigram sets)") {
    for (t <- Seq(100000L, 300000L, 500000L, 800000L, 1000000L))
      assert(got(t, 1) === brute(t, 1), s"thresholdPpm=$t")
  }

  test("identical to brute force across thresholds (3-gram shingles)") {
    for (t <- Seq(200000L, 500000L, 1000000L))
      assert(got(t, 3) === brute(t, 3), s"thresholdPpm=$t")
  }

  test("threshold 1.0 keeps only identical sets") {
    val exact = got(1000000L, 1)
    assert(exact.forall(_._3 == 1000000L))
    assert(exact === brute(1000000L, 1))
  }

  test("empty and sub-shingle docs are excluded, not crashed on") {
    // ids 200/201/202 can never appear at shingleN=3 (fewer than 3 tokens)
    val ids = got(1L, 3).flatMap(p => Seq(p._1, p._2))
    assert(!ids.exists(id => id >= 200L && id <= 202L))
  }
}
