package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Planted-case semantics for [[Dedup.duplicateSpans]] (the distributed
 * Lee-et-al. exact-substring pass): a substring shared verbatim by two
 * documents must come back as one maximal span in each, unique text must
 * produce nothing, and a within-document repeat counts as duplication.
 */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private val k = 10

  private def spans(rows: (Long, String)*): Map[Long, Seq[(Long, Long)]] =
    Dedup.duplicateSpans(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .select($"doc_id", $"span_start".cast("long"), $"span_end".cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq).toMap

  test("a verbatim shared substring yields one maximal span per document") {
    // the shared region includes its flanking spaces (both docs surround
    // the block with a space): " the quick brown fox jumped " = 28 chars
    val shared = "the quick brown fox jumped"
    val out = spans(
      1L -> s"aleph bet gimel $shared dalet he vav",
      2L -> s"zxqwv $shared plugh xyzzy thud")
    val sharedLen = shared.length + 2
    // doc 1: "aleph bet gimel" = 15 chars → shared region starts at 16
    assert(out(1L) === Seq((16L, 15L + sharedLen)))
    // doc 2: "zxqwv" = 5 chars → shared region starts at 6
    assert(out(2L) === Seq((6L, 5L + sharedLen)))
  }

  test("documents with no repeated k-gram produce no spans") {
    val out = spans(
      1L -> "completely unique first document body",
      2L -> "another entirely different second text")
    assert(out.isEmpty)
  }

  test("a within-document repeat is detected without a second document") {
    val out = spans(3L -> "prefix one common shared block middle common shared block suffix")
    // "common shared block" appears twice in doc 3 → two spans in the same doc
    assert(out(3L).length === 2)
  }

  test("two separated shared blocks stay separate spans; gap <= k merges") {
    val a = "first shared sentence block"
    val b = "second shared ending portion"
    // the gap has no internal k-gram repeat (a digit run would!) and is
    // far longer than k ⇒ doc 1 keeps two separate spans
    val out = spans(
      1L -> s"$a abcdefghijklmnopqrstuvwxyz $b",
      2L -> a,
      3L -> b)
    assert(out(1L).length === 2)
    assert(out(2L).length === 1)
    assert(out(3L).length === 1)
  }

  test("short texts (< k chars) are skipped") {
    val out = spans(1L -> "tiny", 2L -> "tiny")
    assert(out.isEmpty)
  }

  private def spansOf(df: org.apache.spark.sql.DataFrame,
      fn: (org.apache.spark.sql.DataFrame, Int) =>
        org.apache.spark.sql.DataFrame,
      kk: Int): Set[(Long, Long, Long, Long)] =
    fn(df, kk)
      
      .select($"doc_id", $"span_start".cast("long"),
        $"span_end".cast("long"), $"n_grams".cast("long"))
      .as[(Long, Long, Long, Long)].collect().toSet

  private val exactFn = (d: org.apache.spark.sql.DataFrame, kk: Int) =>
    Dedup.duplicateSpansExact(d, "doc_id", "text", kk)
  private val kgramFn = (d: org.apache.spark.sql.DataFrame, kk: Int) =>
    Dedup.duplicateSpans(d, "doc_id", "text", kk)

  test("duplicateSpansExact == duplicateSpans on every planted case") {
    // the suffix-rank tier must reproduce the k-gram tier span for span
    // (collision-free corpora — the only regime where they can differ
    // is a 60-bit hash collision, which the exact tier exists to close)
    val shared = "the quick brown fox jumped"
    val corpora = Seq(
      Seq(1L -> s"aleph bet gimel $shared dalet he vav",
        2L -> s"zxqwv $shared plugh xyzzy thud"),
      Seq(1L -> "completely unique first document body",
        2L -> "another entirely different second text"),
      Seq(3L -> "prefix one common shared block middle common shared block suffix"),
      Seq(1L -> "tiny", 2L -> "tiny"),
      Seq(10L -> "exact duplicated body here",
        11L -> "exact duplicated body here"),
      Seq(1L -> s"$shared abcdefghijklmnopqrstuvwxyz second shared ending portion",
        2L -> shared, 3L -> "second shared ending portion"),
      // a 108-char shared block: nonempty spans at k=70, so the
      // doubling round + frozen-provider path runs over real duplicates
      Seq(20L -> ("intro text then " + shared + " " + shared + " " +
          shared + " " + shared + " outro"),
        21L -> ("other head " + shared + " " + shared + " " + shared +
          " " + shared + " and a different tail")))
    for (c <- corpora; kk <- Seq(8, 10, 16, 70)) {
      val df = c.toDF("doc_id", "text")
      assert(spansOf(df, exactFn, kk) ===
        spansOf(df, kgramFn, kk), s"k=$kk corpus=$c")
    }
  }

  test("duplicateSpansExact == duplicateSpans on a random shared-phrase corpus") {
    // 40 docs assembled from a small phrase pool: plenty of genuine
    // cross- and within-doc repeats at every alignment, incl. k a power
    // of two (off = 0 path) and k odd (overlapping-window path)
    val rnd = new scala.util.Random(63L)
    val pool = Vector("alpha beta gamma", "delta epsilon", "zeta eta theta",
      "iota kappa lambda mu", "nu xi", "omicron pi rho sigma tau")
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 3 + rnd.nextInt(5))
        .map(_ => pool(rnd.nextInt(pool.size))).mkString(" "))
    }.toDF("doc_id", "text")
    // seed/doubling paths: k=7 (seed 4, overlap 3), k=16/32 (seed-only,
    // zero overlap), k=33 (seed 32, overlap 1), k=64 (seed 32, one
    // doubling, zero overlap), k=70 (one doubling + overlap 6 —
    // exercises the frozen-provider pruning across rounds), k=130 (two
    // doublings; mostly-empty span sets must agree too)
    for (kk <- Seq(7, 16, 32, 33, 64, 70, 130)) {
      assert(spansOf(docs, exactFn, kk) ===
        spansOf(docs, kgramFn, kk), s"k=$kk")
    }
  }

  test("duplicateSpansExact: minCount > 2 stays exact in both tiers " +
      "(pruning keeps groups of 2 that the final filter then drops)") {
    val shared = "the quick brown fox jumped"
    val big = shared + " " + shared + " " + shared // 80 chars
    val pairBlock = "entirely distinct pair passage"
    val docs = Seq(
      1L -> s"first $big one",
      2L -> s"second $big two",
      3L -> s"third $big three", // big appears 3x; k=70 windows inside
      4L -> s"pair only $pairBlock here",
      5L -> s"pair again $pairBlock there") // pairBlock: exactly 2x
    for (kk <- Seq(10, 70); mc <- Seq(2L, 3L)) {
      val df = docs.toDF("doc_id", "text")
      val exact = Dedup.duplicateSpansExact(df, "doc_id", "text", kk,
          minCount = mc)
        .select($"doc_id", $"span_start".cast("long"),
          $"span_end".cast("long"), $"n_grams".cast("long"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val kgram = Dedup.duplicateSpans(df, "doc_id", "text", kk,
          minCount = mc)
        .select($"doc_id", $"span_start".cast("long"),
          $"span_end".cast("long"), $"n_grams".cast("long"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(exact === kgram, s"k=$kk minCount=$mc")
      if (mc == 3L)
        assert(exact.forall(_._1 <= 3L),
          s"k=$kk: the 2x-only block must vanish at minCount=3: $exact")
    }
  }

  test("duplicateSpansExact: minCount = 1 flags every full-k position " +
      "in both tiers (degenerate but accepted parameter)") {
    // count >= 1 holds for every position, so the answer is each doc's
    // full normalized text as one span — the doubling tier's hash
    // prefilter and singleton pruning are keyed to "at least twice" and
    // must be routed around, not silently applied
    val shared = "the quick brown fox jumped"
    val docs = Seq(
      1L -> s"aleph bet gimel $shared dalet he vav",
      2L -> "a wholly unique second body with nothing repeated anywhere",
      3L -> "tiny").toDF("doc_id", "text")
    for (kk <- Seq(10, 70)) {
      val exact = spansOf(docs, (d, key) =>
        Dedup.duplicateSpansExact(d, "doc_id", "text", key, minCount = 1L), kk)
      val kgram = spansOf(docs, (d, key) =>
        Dedup.duplicateSpans(d, "doc_id", "text", key, minCount = 1L), kk)
      assert(exact === kgram, s"k=$kk")
      // every doc long enough for one k-gram is one full span
      val wantDocs = Seq(1L, 2L).filter { id =>
        val t = docs.filter($"doc_id" === id).head().getString(1)
          .trim.toLowerCase.replaceAll("\\s+", " ")
        t.length >= kk
      }.toSet
      assert(exact.map(_._1) === wantDocs, s"k=$kk: $exact")
      exact.foreach { case (_, s0, _, _) => assert(s0 === 1L) }
    }
  }

  test("duplicateSpans tiers build the k-gram kernel registration-free") {
    // the DataFrame entry points must not depend on GraftExtensions: the
    // hash-stream kernel is constructed directly, so the UNRESOLVED
    // logical plan already carries a KgramHashStream node
    // (call_function would leave an UnresolvedFunction until the session
    // registry resolves it — an analysis failure on plain sessions)
    // (the exact tiers construct their gram streams through the SAME
    // private helper, but their eager localCheckpoints cut the final
    // plan's lineage — the k-gram tier's uncut plan is the observable)
    val docs = Seq(1L -> "some body text here long enough for grams")
      .toDF("doc_id", "text")
    val df = Dedup.duplicateSpans(docs, "doc_id", "text", 10)
    val allExprs = df.queryExecution.logical
      .collect { case n => n.expressions }.flatten
    val direct = allExprs.flatMap(_.collect {
      case e: graft.plans.KgramHashStream => e })
    val unresolved = allExprs.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if u.nameParts == Seq("kgram_hashes") => u })
    assert(direct.nonEmpty && unresolved.isEmpty,
      s"direct=${direct.size} unresolved=${unresolved.size}")
  }

  test("duplicateSpansExact: scalar brute-force substring parity") {
    // independent reference: enumerate every k-substring of the
    // normalized text, count occurrences, merge flagged starts — no
    // hashes, no Spark machinery
    val kk = 9
    val texts = Map(
      1L -> "roses are red violets are blue roses are red sugar is sweet",
      2L -> "violets are blue and so is the sea",
      3L -> "nothing in common with the others at all")
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val grams = texts.toSeq.flatMap { case (id, t0) =>
      val t = norm(t0)
      (1 to t.length - kk + 1).map(p => (id, p, t.substring(p - 1, p - 1 + kk)))
    }
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val want = grams.filter(g => counts(g._3) >= 2)
      .groupBy(_._1).flatMap { case (id, hits) =>
        val ps = hits.map(_._2).sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var start = ps.head; var prev = ps.head; var n = 1L
        ps.tail.foreach { p =>
          if (p - prev <= kk) { prev = p; n += 1 }
          else { spans += ((id, start.toLong, prev.toLong + kk - 1, n))
            start = p; prev = p; n = 1L }
        }
        spans += ((id, start.toLong, prev.toLong + kk - 1, n))
        spans
      }.toSet
    val got = spansOf(texts.toSeq.map { case (i, t) => (i, t) }
      .toDF("doc_id", "text"), exactFn, kk)
    assert(got === want)
  }

  test("topDuplicateSubstrings: hand-counted leaderboard, deterministic ties") {
    val kk = 12
    // "shared block " (12 chars incl. trailing space windows) repeats:
    // construct docs where one passage appears 3x across 2 docs and
    // another 2x in one doc
    val docs = Seq(
      (1L, "AAAA the common passage here BBBB the common passage here"),
      (2L, "CCCC the common passage here DDDD"),
      (3L, "once only text with repeat me twice repeat me twice end"),
      (4L, "nothing shared in this document at all")
    ).toDF("doc_id", "text")
    val got = Dedup.topDuplicateSubstrings(docs, "doc_id", "text",
        k = kk, topN = 500)
      .as[(String, Long, Long)].collect()
    // scalar reference
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val grams = Seq(
      1L -> "AAAA the common passage here BBBB the common passage here",
      2L -> "CCCC the common passage here DDDD",
      3L -> "once only text with repeat me twice repeat me twice end",
      4L -> "nothing shared in this document at all"
    ).flatMap { case (id, t0) =>
      val t = norm(t0)
      (0 to t.length - kk).map(p => (id, t.substring(p, p + kk)))
    }
    val want = grams.groupBy(_._2).map { case (sub, xs) =>
      (sub, xs.size.toLong, xs.map(_._1).distinct.size.toLong)
    }.filter(_._2 >= 2L).toSeq
      .sortBy { case (sub, n, _) => (-n, sub) }
    assert(got.toSeq === want)
    // topN truncates after the deterministic order
    val top3 = Dedup.topDuplicateSubstrings(docs, "doc_id", "text",
        k = kk, topN = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(top3 === want.take(3))
  }

  test("topDuplicateSubstrings: skewed counts and mass boundary ties " +
      "both match an independent reference plan") {
    val kk = 8
    def literal(df: org.apache.spark.sql.DataFrame, topN: Int) = {
      // the single-agg reference, spelled out independently
      df.select($"doc_id", TextFunctions.normalizeText($"text").as("t"))
        .filter(length($"t") >= kk)
        .select($"doc_id",
          explode(sequence(lit(1), length($"t") - lit(kk - 1))).as("p"), $"t")
        .select($"doc_id", $"t".substr($"p", lit(kk)).as("sub"))
        .groupBy($"sub")
        .agg(count(lit(1)).as("n_occurrences"),
          countDistinct($"doc_id").as("n_docs"))
        .filter($"n_occurrences" >= 2)
        .orderBy($"n_occurrences".desc, $"sub")
        .limit(topN)
        .as[(String, Long, Long)].collect().toSeq
    }
    // well-separated counts: a passage planted 9x dominates
    val boiler = "all rights reserved worldwide notice"
    val sep = (0 until 9).map(i => (i.toLong, s"doc body $i $boiler"))
      .toDF("doc_id", "text")
    val gotSep = Dedup.topDuplicateSubstrings(sep, "doc_id", "text",
      k = kk, topN = 1).as[(String, Long, Long)].collect().toSeq
    assert(gotSep === literal(sep, 1))
    // mass boundary ties: 60 distinct repeated passages, every count
    // equal — the exact order of the tied board is lexicographic
    val tied = (0 until 60).flatMap { i =>
      val p = f"unique passage nr $i%02d body"
      Seq((i * 2L, s"first doc $i carries $p"),
        (i * 2L + 1L, s"second doc $i carries $p"))
    }.toDF("doc_id", "text")
    val gotTied = Dedup.topDuplicateSubstrings(tied, "doc_id", "text",
      k = kk, topN = 1).as[(String, Long, Long)].collect().toSeq
    assert(gotTied === literal(tied, 1))
  }

  test("removeDuplicateSpans excises exactly the found spans") {
    val shared = "the quick brown fox jumped"
    val docs = Seq(
      1L -> s"aleph bet gimel $shared dalet he vav",
      2L -> s"zxqwv $shared plugh xyzzy thud",
      3L -> "an entirely unique body with nothing repeated anywhere at all"
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k)
      .select($"doc_id", $"n_kept", $"n_cut", $"text_clean")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // the span covers " the quick brown fox jumped " incl. flanking
    // spaces -> the cut splices the remainders directly together
    // doc 1 span = (16, 43): keep 1..15 ("aleph bet gimel") + 44.. ("dalet he vav")
    assert(out(1L)._4 === "aleph bet gimeldalet he vav")
    assert(out(2L)._4 === "zxqwvplugh xyzzy thud")
    assert(out(1L)._3 === shared.length + 2L)
    // untouched doc passes through with zero cut
    assert(out(3L)._3 === 0L)
    assert(out(3L)._4 === "an entirely unique body with nothing repeated anywhere at all")
    // a FULLY duplicated document empties rather than disappearing
    val twin = Seq(10L -> "exact duplicated body here", 11L -> "exact duplicated body here")
      .toDF("doc_id", "text")
    val twinOut = Dedup.removeDuplicateSpans(twin, "doc_id", "text", k)
      .select($"doc_id", $"n_kept", $"text_clean")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(twinOut.keySet === Set(10L, 11L))
    assert(twinOut(10L)._2 === 0L && twinOut(10L)._3 === "")
  }

  test("dedupLines: first occurrence owns a line; reassembly keeps order") {
    val out = Dedup.dedupLines(Seq(
        (1L, "unique one\nshared footer\nunique two"),
        (2L, "other body\nshared footer\nother tail"),
        (3L, "repeat me\nrepeat me\nlast line"),
        (4L, "unique one\nshared footer") // every line claimed by 1 -> absent
      ).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"n_lines".cast("long"), $"text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((1L, 3L, "unique one\nshared footer\nunique two")))
    assert(out(2L) == ((2L, 2L, "other body\nother tail")))
    assert(out(3L) == ((3L, 2L, "repeat me\nlast line")))
  }

  test("contaminationSpans: verbatim cross-corpus overlap flagged, within-corpus repeats not") {
    val leak = "this exact benchmark passage leaks into training data"
    val bench = Seq((100L, s"intro text $leak outro text")).toDF("doc_id", "text")
    val cands = Seq(
      (1L, s"some training doc containing $leak and more words here"),
      (2L, "a clean training document with no overlap whatsoever in it"),
      // within-CANDIDATE duplication only — must NOT flag (the dup set
      // is the benchmark, not the candidate corpus)
      (3L, "repeated candidate phrase repeated candidate phrase repeated candidate phrase")
    ).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(cands, bench, "doc_id", "text", k = 20)
      .select($"doc_id", $"span_start".cast("long"), $"span_end".cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(spans.map(_._1).toSet === Set(1L))
    val (_, s0, e0) = spans.head
    // the span covers the leaked passage (1-based inclusive, normalized text)
    val norm = s"some training doc containing $leak and more words here"
    val covered = norm.substring(s0.toInt - 1, e0.toInt)
    assert(covered.contains(leak), s"span [$s0,$e0] covers: $covered")
  }

  test("contaminationSpans: a doc fully inside the benchmark is one full span") {
    val t0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq((9L, s"prefix $t0 suffix")).toDF("doc_id", "text")
    val cand = Seq((1L, t0)).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(cand, bench, "doc_id", "text", k = 10)
      .select($"span_start".cast("long"), $"span_end".cast("long"), $"n_grams")
      .as[(Long, Long, Long)].collect()
    assert(spans.length === 1)
    assert(spans.head._1 === 1L && spans.head._2 === t0.length.toLong)
  }

  test("dedupLinesWithinDoc: intra-doc repeats drop, cross-doc lines stay") {
    val out = Dedup.dedupLinesWithinDoc(Seq(
        (1L, "nav\nbody one\nnav\nfooter"),       // intra-doc repeat of nav
        (2L, "nav\nbody two\nfooter"),            // nav again — must SURVIVE here
        (3L, "a\na\na\nb\na"),                    // heavy repeats, order kept
        (4L, "only\nunique\nlines")               // byte-identical passthrough
      ).toDF("doc_id", "text"), "doc_id", "text")
      .select($"doc_id", $"n_lines", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((1L, 3L, 1L, "nav\nbody one\nfooter")))
    assert(out(2L) == ((2L, 3L, 0L, "nav\nbody two\nfooter")))
    assert(out(3L) == ((3L, 2L, 3L, "a\nb")))
    assert(out(4L) == ((4L, 3L, 0L, "only\nunique\nlines")))
  }

  test("dedupLinesWithinDoc is map-only: no exchange in the plan") {
    val df = Dedup.dedupLinesWithinDoc(
      Seq((1L, "x\ny")).toDF("doc_id", "text"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }

  test("dedupLinesWithinDoc: blank lines dedup like any other line") {
    val out = Dedup.dedupLinesWithinDoc(
        Seq((1L, "a\n\nb\n\nc")).toDF("doc_id", "text"), "doc_id", "text")
      .select($"n_lines", $"n_dropped", $"text")
      .as[(Long, Long, String)].head()
    assert(out == ((4L, 1L, "a\n\nb\nc")))
  }

  test("removeBoilerplate: group-frequent lines drop, cross-group stays") {
    // "nav" is in 3/3 of site A's docs (boilerplate there) AND in 1/2 of
    // site B's (below the 60% gate there — must survive); "footer" hits
    // 2/3 of A (66% >= 60% -> drops); unique bodies always survive
    val out = Dedup.removeBoilerplate(Seq(
        (1L, "A", "nav\nbody one\nfooter"),
        (2L, "A", "nav\nbody two\nfooter"),
        (3L, "A", "nav\nbody three"),
        (4L, "B", "nav\nother body"),
        (5L, "B", "just text")
      ).toDF("doc_id", "site", "text"), "doc_id", "text", "site",
        minSharePpm = 600000L)
      .select($"doc_id", $"n_lines", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 2L, "body one")))
    assert(out(2L) == ((2L, 1L, 2L, "body two")))
    assert(out(3L) == ((3L, 1L, 1L, "body three")))
    assert(out(4L) == ((4L, 2L, 0L, "nav\nother body")))
    assert(out(5L) == ((5L, 1L, 0L, "just text")))
  }

  test("removeBoilerplate: singleton group exempt; all-boiler doc kept empty") {
    val out = Dedup.removeBoilerplate(Seq(
        (1L, "S", "only doc of its site\nnav"),   // gdocs=1 < minDocs: exempt
        (2L, "T", "nav"),                          // nav is 2/2 of T
        (3L, "T", "nav")                           // -> both become empty
      ).toDF("doc_id", "g", "text"), "doc_id", "text", "g",
        minSharePpm = 500000L)
      .select($"doc_id", $"n_lines", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 0L, "only doc of its site\nnav")))
    assert(out(2L) == ((2L, 0L, 1L, "")))
    assert(out(3L) == ((3L, 0L, 1L, "")))
  }

  test("removeBoilerplate: repeated line within ONE doc counts that doc once") {
    // doc 1 contains "dup" twice; docs_with(dup) = 1 of 2 -> below the
    // 60% gate, so the within-doc repeat is NOT this operator's business
    val out = Dedup.removeBoilerplate(Seq(
        (1L, "G", "dup\nbody\ndup"),
        (2L, "G", "other")
      ).toDF("doc_id", "g", "text"), "doc_id", "text", "g",
        minSharePpm = 600000L)
      .select($"doc_id", $"n_lines").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("removeBoilerplate: NULL text behaves like empty text, never n_dropped=-1") {
    // split(NULL) is NULL (size -1) — without the coalesce, doc 2 would
    // emit (n_lines=0, n_dropped=-1); it must match the empty-string doc
    val out = Dedup.removeBoilerplate(Seq(
        (1L, "G", "body"),
        (2L, "G", null.asInstanceOf[String]),
        (3L, "G", "")
      ).toDF("doc_id", "g", "text"), "doc_id", "text", "g")
      .select($"doc_id", $"n_lines", $"n_dropped", $"text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 0L, "body")))
    // NULL and "" both read as one empty line; that line appears in 2/3
    // of the group (>= the 50% default gate) so it drops for both,
    // leaving identical (0 lines, 1 dropped, "") rows — never -1
    assert(out(2L) == ((2L, 0L, 1L, "")))
    assert(out(3L) == ((3L, 0L, 1L, "")))
  }
}
