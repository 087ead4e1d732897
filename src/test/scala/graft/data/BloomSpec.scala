package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Portable Bloom bitset ([[Sketches.bloomSketch]]) and the guarded exact
 * decontamination built on it ([[Corpus.decontaminateExact]]): no false
 * negatives ever, bit_or-mergeable words, bounded false-positive rate,
 * and guard-then-verify gives exactly the plain semi-join answer.
 */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 4096
  private val K = 4

  private def dense(values: Seq[Long]) =
    Sketches.bloomDense(
      Sketches.bloomSketch(values.toDF("v"), col("v"), M, K), M)

  test("no false negatives: every inserted value probes true") {
    val vals = Seq.tabulate(200)(i => 1000L + 37L * i)
    val hits = dense(vals).crossJoin(vals.toDF("v"))
      .select(Sketches.bloomMightContain(col("words"), col("v"), M, K))
      .as[Boolean].collect()
    assert(hits.length === 200 && hits.forall(identity))
  }

  test("false-positive rate stays near (1-e^(-kN/m))^k") {
    val inserted = Seq.tabulate(100)(i => 5000L + 11L * i)
    val probes = Seq.tabulate(2000)(i => 900000L + i.toLong)
    val fp = dense(inserted).crossJoin(probes.toDF("v"))
      .select(Sketches.bloomMightContain(col("words"), col("v"), M, K))
      .as[Boolean].collect().count(identity)
    // theoretical ~ (1 - e^(-4*100/4096))^4 ~= 7.3e-5 -> expect ~0.15 of
    // 2000; allow generous slack for hash variance
    assert(fp <= 10, s"fp=$fp of 2000")
  }

  test("union of sketches == sketch of union (bit_or by word_idx)") {
    val a = Seq.tabulate(80)(i => 300L + 7L * i)
    val b = Seq.tabulate(80)(i => 800L + 13L * i)
    def sparse(vs: Seq[Long]): Map[Long, Long] =
      Sketches.bloomSketch(vs.toDF("v"), col("v"), M, K)
        .as[(Long, Long)].collect().toMap
    val whole = sparse(a ++ b)
    val sa = sparse(a); val sb = sparse(b)
    val merged = (sa.keySet ++ sb.keySet).map(k =>
      k -> (sa.getOrElse(k, 0L) | sb.getOrElse(k, 0L))).toMap
    assert(merged === whole)
  }

  test("word values fit 32 bits (portable: no engine shift-overflow)") {
    val words = Sketches.bloomSketch(
        Seq.tabulate(500)(_.toLong).toDF("v"), col("v"), M, K)
      .select(col("word")).as[Long].collect()
    assert(words.forall(w => w > 0 && w <= 0xFFFFFFFFL))
  }

  test("guarded decon equals the plain semi-join, incl. normalization") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "THE  Quick   Brown FOX jumps over the dog"), // case/ws variant
      (3L, "a completely unrelated document body"),
      (4L, "held out benchmark question one"),
      (5L, "another clean document about spark plans"))
      .toDF("doc_id", "text")
    val bench = Seq(
      "the quick brown fox jumps over the dog",
      "held out benchmark question one").toDF("text")
    val got = Corpus.decontaminateExact(corpus, "doc_id", "text", bench)
      .select(col("doc_id"), col("contaminated"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> false,
      4L -> true, 5L -> false))
  }

  test("null text survives the guard as definitively clean") {
    // a NULL fingerprint makes the raw bloom probe NULL, which both
    // branch filters would silently drop; the coalesce keeps the row in
    // the clean branch — identical to the plain semi-join's answer
    val corpus = Seq((1L, "aaa bbb"), (2L, null.asInstanceOf[String]),
        (3L, "ccc ddd")).toDF("doc_id", "text")
    val bench = Seq("aaa bbb").toDF("text")
    val got = Corpus.decontaminateExact(corpus, "doc_id", "text", bench)
      .select(col("doc_id"), col("contaminated"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("the clean stream never enters a join (guard is map-side)") {
    val corpus = Seq((1L, "aaa bbb"), (2L, "ccc ddd")).toDF("doc_id", "text")
    val bench = Seq("aaa bbb").toDF("text")
    val plan = Corpus.decontaminateExact(corpus, "doc_id", "text", bench)
      .queryExecution.optimizedPlan
    val union = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
    assert(union.nonEmpty, plan.toString)
    // the verify join keys on the fingerprint (__fp from both sides);
    // the clean branch's ONLY join is the broadcast-bitset cross join
    def verifyJoins(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.children.forall(_.output.exists(_.name == "__fp")) => j
      }.size
    val counts = union.head.children.map(verifyJoins)
    assert(counts.sorted === Seq(0, 1), counts.toString)
  }
}
