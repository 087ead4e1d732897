package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Edit-distance verification tier ([[Dedup.editNearDups]]): a literal
 * few-edit near-dup survives with its exact Levenshtein distance, a
 * reordered doc (high Jaccard, huge edit distance) is cut by the bound,
 * and texts join back by id instead of riding the band shuffle.
 */
class EditNearDupsSpec extends SparkSpec {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  // one token substituted mid-doc: same length class, tiny edit distance
  private val edited = base.replace("sigma", "sigmb")
  // same tokens fully reversed: near-identical shingle-free? no — word
  // 3-grams all differ, but unigram multiset identical; minhash on
  // 3-gram shingles finds NO band, so it never becomes a candidate
  private val reversed = base.split(" ").reverse.mkString(" ")

  private lazy val docs = Seq(
    (1L, base), (2L, edited), (3L, reversed),
    (4L, "completely different text about query engines and shuffles " +
      "with enough words to clear the shingle minimum for hashing"))
    .toDF("doc_id", "text")

  test("few-edit dup found with its exact distance") {
    val got = Dedup.editNearDups(docs, "doc_id", "text", maxDist = 10)
      .select(col("id_a"), col("id_b"), col("lev"))
      .as[(Long, Long, Long)].collect().toList
    assert(got === List((1L, 2L, 1L)))
  }

  test("the bound cuts candidates whose distance exceeds it") {
    val tight = Dedup.editNearDups(docs, "doc_id", "text", maxDist = 0)
    assert(tight.count() === 0L)
  }

  test("edit_sim is 1 - lev/maxlen") {
    val sim = Dedup.editNearDups(docs, "doc_id", "text", maxDist = 10)
      .select(col("edit_sim")).as[Double].head()
    val expect = 1.0 - 1.0 / base.length.max(edited.length)
    assert(math.abs(sim - math.rint(expect * 1e6) / 1e6) < 1e-9)
  }

  test("texts do not ride the band-key shuffle (joined back by id)") {
    val plan = Dedup.editNearDups(docs, "doc_id", "text", maxDist = 10)
      .queryExecution.optimizedPlan
    // exactly three joins: the band-key self-join plus the two id->text
    // join-backs — and the band join's inputs never project the text
    // column (it would multiply text volume by the band count)
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size === 3, plan.toString)
    val bandJoin = joins.find(_.condition.exists(_.references
      .exists(_.name == "band"))).orElse(joins.lastOption).get
    val carried = bandJoin.children.flatMap(_.output.map(_.name))
    assert(!carried.contains("text") && !carried.contains("text_a"),
      carried.mkString(","))
  }

  test("editNearDups builds the banded kernel registration-free") {
    // the DataFrame entry point must not depend on GraftExtensions: the
    // kernel is constructed directly, so the UNRESOLVED logical plan
    // already carries an EditDistanceBand node (call_function would
    // leave an UnresolvedFunction until the registry resolves it)
    val plan = Dedup.editNearDups(docs, "doc_id", "text", maxDist = 10)
      .queryExecution.logical
    val allExprs = plan.collect { case n => n.expressions }.flatten
    val direct = allExprs.flatMap(_.collect {
      case e: graft.plans.EditDistanceBand => e })
    val unresolved = allExprs.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if u.nameParts == Seq("lev_banded") => u })
    assert(direct.nonEmpty && unresolved.isEmpty,
      s"direct=${direct.size} unresolved=${unresolved.size}")
  }

  test("lev_banded SQL surface rejects bad arguments with a clear error") {
    import org.apache.spark.sql.AnalysisException
    def msg(sql: String): String =
      intercept[AnalysisException](spark.sql(sql).collect()).getMessage
    assert(msg("SELECT lev_banded('a', 'b')").contains("exactly 3 arguments"))
    assert(msg("SELECT lev_banded('a', 'b', 1, 2)").contains("exactly 3 arguments"))
    assert(msg("SELECT lev_banded('a', 'b', CAST(NULL AS INT))")
      .contains("non-null integer literal"))
    assert(msg("SELECT lev_banded('a', 'b', -1)").contains("must be in [0,"))
    assert(msg("SELECT lev_banded('a', 'b', 'x')").contains("integer literal"))
    // non-foldable max: a column reference cannot parameterize the band
    val viewName = "lev_banded_args_src"
    Seq(("ab", "ba", 2)).toDF("a", "b", "m").createOrReplaceTempView(viewName)
    assert(msg(s"SELECT lev_banded(a, b, m) FROM $viewName")
      .contains("foldable integer literal"))
    // and the good spelling still evaluates
    assert(spark.sql("SELECT lev_banded('kitten', 'sitting', 5)")
      .head().getInt(0) === 3)
  }

  test("lev_banded == Spark's levenshtein(a, b, max) on random pairs") {
    // both code paths: bit-parallel (short patterns incl. multi-block
    // m > 64) and the banded-DP fallback (m > 64*(2*max+1), via max=0/1
    // on long strings); plus empties, equals, and surrogate pairs
    val rnd = new scala.util.Random(20260815L)
    val alphabets = Seq("ab", "abcde ", "abcdefghijklmnopqrstuvwxyz .,!",
      "a😀bé") // incl. a non-BMP code point + accents
    def randStr(maxLen: Int, alpha: String): String = {
      val cps = alpha.codePoints().toArray
      val n = rnd.nextInt(maxLen + 1)
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.appendAll(
        Character.toChars(cps(rnd.nextInt(cps.length)))))
      sb.toString
    }
    val cases = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int)]
    for (_ <- 0 until 400) {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val a = randStr(90, alpha)
      // half the time: b = a mutated a little (exercises small lev)
      val b =
        if (rnd.nextBoolean()) randStr(90, alpha)
        else a.toCharArray.zipWithIndex.collect {
          case (c, i) if rnd.nextInt(10) > 0 => c }.mkString
      cases += ((a, b, rnd.nextInt(8)))
      cases += ((a, b, 200)) // always within bound: exact value parity
    }
    // banded-DP fallback regime: 400-char patterns, max 0..2
    for (_ <- 0 until 30) {
      val a = randStr(400, "ab") + "x" * 200
      val b = if (rnd.nextBoolean()) a.patch(rnd.nextInt(a.length), "q", 1)
        else randStr(600, "ab")
      cases += ((a, b, rnd.nextInt(3)))
    }
    cases += (("", "", 0))
    cases += (("", "abc", 2))
    cases += (("abc", "abc", 0))
    // word-boundary pattern lengths: the score bit sits at 62/63/0 of
    // the last block and the block count flips 1->2->3 — each with an
    // equal pair, a 1-edit pair, and a shifted (all-insert) pair
    for (m <- Seq(63, 64, 65, 127, 128, 129)) {
      val a = (0 until m).map(i => ('a' + (i * 7 % 26)).toChar).mkString
      cases += ((a, a, 2))
      cases += ((a, a.updated(m / 2, 'Z'), 2))
      cases += ((a, "XY" + a, 3))
      cases += ((a, a.drop(3), 2))
    }
    val df = cases.toSeq.toDF("a", "b", "mx")
    val maxes = cases.map(_._3).distinct
    maxes.foreach { mx =>
      val part = df.filter(col("mx") === mx)
      val got = part.select(
        call_function("lev_banded", col("a"), col("b"), lit(mx)),
        levenshtein(col("a"), col("b"), mx))
        .as[(Int, Int)].collect()
      got.foreach { case (ours, ref) => assert(ours === ref, s"max=$mx") }
    }
  }

  test("crossSourceOverlap: matrix matches brute-force pair sources, unordered") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, "wiki", base), (2L, "web", base + " x"),          // cross pair
      (3L, "web", base + " y"),                              // web internal w/ 2
      (4L, "wiki", "completely different text about sparks and shuffles here now"),
      (5L, "news", "another unrelated document that matches nothing else at all"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.crossSourceOverlap(docs, "doc_id", "text", "source",
        threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // brute reference from the pair table itself
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    val srcOf = Map(1L -> "wiki", 2L -> "web", 3L -> "web", 4L -> "wiki",
      5L -> "news")
    val want = pairs.map { case (a, b) =>
      val (x, y) = (srcOf(a), srcOf(b))
      (if (x <= y) (x, y) else (y, x))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)
    // the planted cross-source pair is present
    assert(got.keySet.contains(("web", "wiki")))
  }
}
