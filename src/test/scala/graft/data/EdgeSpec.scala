package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior for the newest operators: empties and
 * all-duplicate corners must produce empty/identity results, never
 * throw. */
class EdgeSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noVecs = Seq.empty[(Long, Array[Double])].toDF("vec_id", "v")
  private lazy val someVecs = (0L to 5L).map(i =>
    (i, Array.tabulate(8)(d => (i + d) / 10.0))).toDF("vec_id", "v")

  test("PQ search over an empty corpus / with no queries returns nothing") {
    val cb = Pq.seedCodebook(2, 4, 4)
    assert(Pq.pqTopK(someVecs, noVecs, "vec_id", "v", k = 2, cb).count() === 0L)
    assert(Pq.pqTopK(noVecs, someVecs, "vec_id", "v", k = 2, cb).count() === 0L)
    assert(Pq.ivfPqTopK(noVecs, someVecs, "vec_id", "v", k = 2, nProbe = 2,
      Similarity.planes(4, 8), cb).count() === 0L)
  }

  test("duplicateSpans / dedupLines / contamination on empty input") {
    assert(Dedup.duplicateSpans(noDocs, "doc_id", "text", k = 10).count() === 0L)
    assert(Dedup.dedupLines(noDocs, "doc_id", "text").count() === 0L)
    assert(Dedup.contamination(noDocs, noDocs, "doc_id", "text").count() === 0L)
  }

  test("round-7 second-batch operators on empty input never throw") {
    assert(Dedup.dedupLinesWithinDoc(noDocs, "doc_id", "text").count() === 0L)
    assert(Dedup.contaminationSpans(noDocs, noDocs, "doc_id", "text",
      k = 10).count() === 0L)
    // clean candidates vs an empty benchmark: nothing can be contaminated
    val d = Seq((1L, "some perfectly ordinary training text here")).toDF("doc_id", "text")
    assert(Dedup.contaminationSpans(d, noDocs, "doc_id", "text", k = 10)
      .count() === 0L)
  }

  test("tokenDrift with one empty side: ppm 0 there, no divide-by-zero") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = Corpus.tokenDrift(noDocs, docs, "text", topK = 10)
      .select($"tok", $"n_before", $"ppm_before", $"ppm_after")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSet === Set("alpha", "beta"))
    assert(out.forall(r => r._2 === 0L && r._3 === 0L && r._4 === 500000L))
    // both sides empty: empty leaderboard
    assert(Corpus.tokenDrift(noDocs, noDocs, "text").count() === 0L)
  }

  test("calibration2 on an empty test split returns no bins") {
    val train = Seq((1L, Seq(1.0, 0.0), 1.0), (2L, Seq(2.0, 1.0), 2.0),
      (3L, Seq(3.0, 1.0), 3.0)).toDF("id", "v", "y")
    val empty = Seq.empty[(Long, Seq[Double], Double)].toDF("id", "v", "y")
    assert(Probe.calibration2(train, empty, "v", "y").count() === 0L)
  }

  test("canonicalUrl degenerate inputs: empty, no scheme, query-only") {
    def canon(u: String): String = Seq(u).toDF("u")
      .select(TextFunctions.canonicalUrl(col("u"))).as[String].head()
    assert(canon("") === "")
    assert(canon("example.com/x") === "example.com/x") // scheme-less passes through
    assert(canon("https://example.com?utm_source=x") === "example.com")
    assert(canon("https://example.com/?a=1&utm_x=2&b=3") === "example.com?a=1&b=3")
  }

  test("prefixSum / packSequences on empty and single-row input") {
    assert(Relational.prefixSum(noDocs.select($"doc_id", lit(1L).as("v")),
      "doc_id", col("v"), "p").count() === 0L)
    val one = Seq((7L, 5L)).toDF("doc_id", "n")
    val packed = Corpus.packSequences(one, "doc_id", $"n", contextLen = 4)
      .select($"tok_start", $"tok_end", $"pack_first", $"pack_last", $"n_packs")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(packed === ((0L, 5L, 0L, 1L, 2L))) // 5 tokens straddle one cut
  }

  test("dedupLines when every line of every doc is blank") {
    val out = Dedup.dedupLines(Seq((1L, "\n\n"), (2L, "\n")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select($"doc_id", $"n_lines".cast("long")).as[(Long, Long)].collect().toMap
    // doc 1 owns the (single surviving) blank line; doc 2 is fully consumed
    assert(out === Map(1L -> 1L))
  }

  test("packSequences: a zero-token doc occupies no packs, neighbors unaffected") {
    val docs = Seq((1L, 3L), (2L, 0L), (3L, 6L)).toDF("doc_id", "n")
    val rows = Corpus.packSequences(docs, "doc_id", $"n", contextLen = 4)
      .select($"doc_id", $"tok_start", $"tok_end", $"pack_first", $"pack_last",
        $"n_packs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 2: empty [3, 3) interval -> zero packs, pack_last = pack_first - 1
    assert(rows(1) === ((2L, 3L, 3L, 0L, -1L, 0L)))
    // the zero-token doc shifts nothing: doc 3 still starts at token 3
    assert(rows(0) === ((1L, 0L, 3L, 0L, 0L, 1L)))
    assert(rows(2) === ((3L, 3L, 9L, 0L, 2L, 3L)))
  }

  test("top_ngram_frac on null-bearing token arrays matches the concat_ws spelling") {
    // concat_ws skips null tokens AND their separator: [a, null, a] has
    // bigrams "a","a" (not "a ", " a") — the native kernel must agree
    val df = Seq(
        Tuple1(Seq[String]("a", null, "a")),
        Tuple1(Seq[String]("x", null, "y")),
        Tuple1(Seq[String](null, null, "z")))
      .toDF("toks")
    val grams = Dedup.wordShingles(col("toks"), 2)
    val composable = coalesce(array_max(transform(array_distinct(grams),
        g => size(filter(grams, x => x === g)))), lit(0)) /
      greatest(array_size(grams), lit(1)).cast("double")
    val out = df.select(
        call_function("top_ngram_frac", col("toks"), lit(2)).as("native"),
        composable.as("composed"))
      .as[(Double, Double)].collect()
    assert(out.forall { case (n, c) => n === c }, out.toSeq.toString)
    assert(out.map(_._1).toSeq === Seq(1.0, 0.5, 0.5))
  }

  test("pq_adc skips null LUT rows and fails loudly on out-of-range codes") {
    val ok = Seq((Seq(0, 1), Seq[Seq[Double]](null, Seq(1.0, 2.0))))
      .toDF("codes", "lut")
      .select(call_function("pq_adc", col("codes"), col("lut")))
      .as[Double].head()
    assert(ok === 2.0) // null row contributes nothing rather than NPEing
    val bad = Seq((Seq(5), Seq(Seq(1.0, 2.0)))).toDF("codes", "lut")
      .select(call_function("pq_adc", col("codes"), col("lut")))
    val e = intercept[Exception](bad.collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("pq_adc: code 5 out of range")),
      messages(e).toString)
  }

  test("contamination is set-containment: a repeated shared gram counts once") {
    // candidate repeats the benchmark phrase: 7 gram OCCURRENCES but only
    // 3 distinct grams, of which 1 ("a b c") is in the benchmark.
    // Set containment = 1/3; occurrence-weighted would be 3/7.
    val cand = Seq((1L, "a b c a b c a b c")).toDF("doc_id", "text")
    val bench = Seq((0L, "a b c")).toDF("doc_id", "text")
    val r = Dedup.contamination(cand, bench, "doc_id", "text", shingleN = 3)
      .select($"doc_id", $"n_shared", $"n_grams", $"containment")
      .as[(Long, Long, Int, Double)].head()
    assert(r === ((1L, 1L, 3, 1.0 / 3)))
  }

  test("gopherStats and topNgramFraction on empty text") {
    val r = Seq("").toDF("text").select(
        TextFunctions.gopherStats(col("text"))("mean_word_len").as("mwl"),
        TextFunctions.topNgramFraction(col("text"), 3).as("t3"))
      .as[(Double, Double)].head()
    assert(r._1 === 0.0 && r._2 === 0.0)
  }

  test("dimensionStats / standardize on a single vector: sample std guarded to 0") {
    val one = Seq((1L, Array(3.0, 7.0))).toDF("id", "v")
    val stats = Similarity.dimensionStats(one, "v")
      .orderBy(col("dim")).select(col("n"), col("std"), col("mean"))
      .as[(Long, Double, Double)].collect()
    assert(stats.forall(r => r._1 == 1L && r._2 == 0.0)) // not NaN
    assert(stats.map(_._3).toSeq === Seq(3.0, 7.0))
    val z = Similarity.standardize(one, "id", "v")
      .select(col("z")).as[Seq[Double]].head()
    assert(z === Seq(0.0, 0.0)) // dead-by-singleton dims map to 0
  }

  test("empty inputs: editNearDups, minePairs, contamination, skewReport, ecdf") {
    assert(Dedup.editNearDups(noDocs, "doc_id", "text", maxDist = 5)
      .count() === 0L)
    assert(Similarity.minePairs(noVecs, "vec_id", "v",
      Array(Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      0.9, 0.1, 0.5).count() === 0L)
    // empty BENCH side: nothing can be contaminated
    assert(Similarity.contaminationReport(someVecs, noVecs, "vec_id", "v",
      0.1).count() === 0L)
    assert(Relational.skewReport(noDocs, col("doc_id")).count() === 0L)
    val e = Sketches.ecdfNormalize(noDocs, col("doc_id"), 0.0, 10.0, 4)
    assert(e.columns.contains("ecdf_ppm") && e.count() === 0L)
  }

  test("single-member and self-pair corners: prototypePrune, mmrRerank") {
    val solo = Seq((1L, Array(1.0, 0.0))).toDF("id", "v")
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // one member, dropFrac .5 -> ceil(.5)=1 dropped: the lone member goes
    val pruned = Similarity.prototypePrune(solo, "id", "v", cents, 0.5)
      .select(col("kept")).as[Boolean].head()
    assert(!pruned)
    // a single candidate reranks to rank 1 regardless of lambda
    val mmr = Similarity.mmrRerank(
        Seq((7L, 1L, 0.9, Array(1.0, 0.0))).toDF("q", "id", "sim", "v"),
        "q", "id", "sim", "v", 0.0, k = 5)
      .select(col("rank"), col("id")).as[(Int, Long)].collect().toList
    assert(mmr === List((1, 1L)))
  }
}
