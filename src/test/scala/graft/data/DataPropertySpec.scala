package graft.data

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.plans.{KgramHashStream, Md5PrefixHash, PqEncodeExpr, TopNgramFrac}

/**
 * Property tests for the native expressions' JVM kernels against
 * straightforward Scala references — the single-pass/fused
 * implementations must agree with the obvious spellings on arbitrary
 * input, not just the planted spec cases. (Deterministic seeds; local
 * forAll — no scalatestplus bridge in the offline cache.)
 */
class DataPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](g: Gen[A], n: Int = 80)(f: A => Unit): Unit = {
    var seed = Seed(4242L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val word: Gen[String] = Gen.chooseNum(1, 4)
    .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val tokList: Gen[List[String]] = Gen.listOf(word)

  test("TopNgramFrac.compute equals a sliding-window reference count") {
    forAll(for { ts <- tokList; n <- Gen.chooseNum(1, 4) } yield (ts, n)) {
      case (ts, n) =>
        val got = TopNgramFrac.compute(
          new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any]), n)
        val grams = ts.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        val want =
          if (grams.isEmpty) 0.0
          else grams.groupBy(identity).values.map(_.size).max / grams.size.toDouble
        assert(got === want, s"tokens=$ts n=$n")
    }
  }

  test("KgramHashStream.compute is the per-position md5-prefix hash") {
    val text: Gen[String] = Gen.listOf(Gen.oneOf('x', 'y', ' ')).map(_.mkString)
    forAll(for { t <- text; k <- Gen.chooseNum(1, 5) } yield (t, k)) {
      case (t, k) =>
        val got = KgramHashStream.compute(UTF8String.fromString(t), k, 7).toLongArray()
        val want = (0 to t.length - k)
          .map(i => Md5PrefixHash.hash(UTF8String.fromString(t.substring(i, i + k)), 7))
        assert(got.toSeq === want, s"text='$t' k=$k")
    }
  }

  test("PqEncodeExpr.compute is the argmin-L2 code with lower-code ties") {
    // quarter-integer coordinates: squares/products are exact in binary,
    // so the reference's sum-of-squares and the kernel's |x|²−2<x,c>+|c|²
    // spellings agree EXACTLY and the argmin comparison cannot flake on
    // spelling-dependent rounding near ties
    val q = Gen.chooseNum(-8, 8).map(_ / 4.0)
    val gen = for {
      m <- Gen.chooseNum(1, 3)
      subDim <- Gen.chooseNum(1, 3)
      ksub <- Gen.chooseNum(1, 4)
      cb <- Gen.listOfN(m * ksub * subDim, q)
      v <- Gen.listOfN(m * subDim, q)
    } yield (m, subDim, ksub, cb, v)
    forAll(gen) { case (m, subDim, ksub, flat, v) =>
      val cb = flat.grouped(subDim).grouped(ksub)
        .map(_.map(_.toArray).toArray).toArray
      val got = PqEncodeExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(null),
        cb.map(_.map(_.toSeq).toSeq).toSeq)
        .compute(new GenericArrayData(v.toArray)).toIntArray()
      val want = (0 until m).map { sub =>
        val xs = v.slice(sub * subDim, (sub + 1) * subDim)
        (0 until ksub).minBy { code =>
          val c = cb(sub)(code)
          (xs.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, code)
        }
      }
      assert(got.toSeq === want, s"m=$m subDim=$subDim ksub=$ksub")
    }
  }

  test("prefixSum equals the sequential reference; packing intervals tile exactly") {
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      keys <- Gen.pick(n, 0L until 1000L)
      vals <- Gen.listOfN(n, Gen.chooseNum(0L, 50L))
    } yield keys.toList.zip(vals)
    forAll(gen, n = 6) { rows =>
      val df = rows.toDF("k", "v")
      val got = Relational.prefixSum(df, "k", org.apache.spark.sql.functions.col("v"), "p")
        .select($"k", $"v", $"p").as[(Long, Long, Long)].collect()
        .sortBy(_._1)
      val want = rows.sortBy(_._1).scanLeft(0L)(_ + _._2).init
      assert(got.map(_._3).toSeq === want.toSeq, s"rows=$rows")
      // packing tiles the token axis: each start = previous end
      val packed = Corpus.packSequences(df.withColumnRenamed("v", "n_tokens"),
          "k", $"n_tokens", contextLen = 7)
        .select($"k", $"tok_start", $"tok_end", $"pack_first", $"pack_last",
          $"n_packs")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .sortBy(_._1)
      packed.sliding(2).foreach {
        case Array((_, _, e, _, _, _), (_, s, _, _, _, _)) => assert(s === e)
        case _ => ()
      }
      // pack interval semantics: a zero-token doc occupies NO packs
      // (n_packs = 0, pack_last = pack_first - 1); otherwise n_packs
      // counts the contextLen-chunks the [start, end) interval touches
      packed.foreach { case (k, s, e, pf, pl, np) =>
        assert(pf === s / 7, s"k=$k")
        if (e == s) { assert(np === 0L, s"k=$k"); assert(pl === pf - 1, s"k=$k") }
        else {
          assert(pl === (e - 1) / 7, s"k=$k")
          assert(np === pl - pf + 1 && np >= 1L, s"k=$k")
        }
      }
    }
  }

  test("chunkDocuments: full coverage, stride spacing, window bounds for any doc") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      w <- Gen.chooseNum(1, 12)
      o <- Gen.chooseNum(0, 11).map(math.min(_, w - 1))
    } yield (n, w, o)
    forAll(gen, n = 8) { case (n, w, o) =>
      val text = (0 until n).map(i => s"t$i").mkString(" ")
      val chunks = Corpus.chunkDocuments(Seq((1L, text)).toDF("doc_id", "text"),
          "doc_id", "text", chunkTokens = w, overlap = o)
        .select($"chunk_id", $"tok_start", $"tok_end")
        .as[(Int, Int, Int)].collect().sortBy(_._1)
      // starts advance by exactly the stride; first chunk starts at 0
      assert(chunks.head._2 === 0, s"n=$n w=$w o=$o")
      chunks.sliding(2).foreach {
        case Array((_, s1, _), (_, s2, _)) => assert(s2 - s1 === w - o)
        case _ => ()
      }
      // each window is at most w tokens, clipped at the doc end
      assert(chunks.forall { case (_, s, e) => e - s <= w && e <= n && s < n })
      // every token index is covered
      assert(chunks.flatMap(c => c._2 until c._3).toSet === (0 until n).toSet,
        s"n=$n w=$w o=$o")
    }
  }

  test("dedupLines conserves the corpus' distinct lines exactly once") {
    val docGen = Gen.listOfN(4,
      Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, word).map(_.mkString("\n"))))
    forAll(docGen, n = 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.dedupLines(docs, "doc_id", "text")
        .select($"text").as[String].collect()
      val survivors = out.flatMap(_.split("\n", -1))
      val distinctIn = texts.flatMap(_.split("\n", -1)).distinct.sorted
      // every distinct corpus line survives exactly once, nothing else
      assert(survivors.sorted.toSeq === distinctIn.toSeq)
    }
  }

  test("dedupLinesWithinDoc: reference semantics + idempotence on arbitrary docs") {
    val docGen = Gen.listOfN(4,
      Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, word).map(_.mkString("\n"))))
    forAll(docGen, n = 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.dedupLinesWithinDoc(docs, "doc_id", "text")
      val got = once.select($"doc_id", $"text").as[(Long, String)]
        .collect().toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val ref = t.split("\n", -1).distinct.mkString("\n") // order-preserving
        assert(got(i.toLong) === ref, s"doc $i: $t")
      }
      // idempotent: a second pass changes nothing
      val twice = Dedup.dedupLinesWithinDoc(
          once.select($"doc_id", $"text"), "doc_id", "text")
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      assert(twice === got)
    }
  }

  test("contaminationSpans(docs, docs) covers every doc with one full span") {
    // self-decontamination: every k-gram of a doc trivially occurs in the
    // benchmark (itself), so each doc ≥ k chars collapses to ONE span
    // covering its whole normalized text
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "short")).toDF("doc_id", "text")
    val k = 10
    val spans = Dedup.contaminationSpans(docs, docs, "doc_id", "text", k)
      .select($"doc_id", $"span_start".cast("long"), $"span_end".cast("long"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(spans.keySet === Set(1L, 2L)) // doc 3 is under k chars
    Seq(1L -> "alpha beta gamma delta epsilon zeta",
        2L -> "the quick brown fox jumps over the lazy dog").foreach {
      case (id, t) =>
        assert(spans(id).toSeq === Seq((id, 1L, t.length.toLong)))
    }
  }

  test("property: cardUpdate and tokenCountsUpdate equal full recomputes on random diffs") {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "")
    val genSnap = for {
      n <- Gen.choose(0, 12)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(1L, 15L)
        nw <- Gen.choose(0, 6)
        ws <- Gen.listOfN(nw, Gen.oneOf(words))
      } yield (id, ws.mkString(" ")))
    } yield rows.groupBy(_._1).map { case (id, g) => (id, g.head._2) }.toSeq
    forAll(Gen.zip(genSnap, genSnap), n = 25) { case (oldRows, newRows) =>
      val o = oldRows.toDF("id", "text")
      val nw = newRows.toDF("id", "text")
      val card = Corpus.cardUpdate(Corpus.cardDecomposable(o, "text"), o, nw)
        .as[(String, Long)].collect().toMap
      assert(card === Corpus.cardDecomposable(nw, "text")
        .as[(String, Long)].collect().toMap)
      val counts = Corpus.tokenCountsUpdate(Corpus.tokenCounts(o, "text"),
          o, nw)
        .as[(String, Long)].collect().toMap
      assert(counts === Corpus.tokenCounts(nw, "text")
        .as[(String, Long)].collect().toMap)
    }
  }

  test("property: clusterSafeSplit never splits a component, any random pair graph") {
    val genPairs = for {
      n <- Gen.choose(0, 15)
      es <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 20L), Gen.choose(1L, 20L)))
    } yield es.filter { case (a, b) => a != b }
    forAll(genPairs, n = 20) { es =>
      val docs = (1L to 20L).map(i => (i, s"d$i")).toDF("id", "text")
      val got = Sampling.clusterSafeSplit(docs, "id",
          es.toDF("id_a", "id_b"), Seq("a" -> 0.5, "b" -> 0.5), "ps")
        .select($"id", $"split").as[(Long, String)].collect().toMap
      // reference components via union-find
      val parent = scala.collection.mutable.Map((1L to 20L).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) => parent(find(a)) = find(b) }
      (1L to 20L).groupBy(find).values.foreach { comp =>
        assert(comp.map(got).toSet.size === 1,
          s"component $comp straddles under edges $es")
      }
    }
  }

  test("property: hllUnion is invariant to how the rows are partitioned into parts") {
    val genVals = Gen.listOfN(120, Gen.choose(0, 400))
    forAll(Gen.zip(genVals, Gen.choose(1, 6)), n = 15) { case (vs, nParts) =>
      val whole = Sketches.hllSketch(vs.map(v => Tuple1(s"v$v")).toDF("v"),
          Seq.empty, $"v")
        .select($"registers").as[Seq[Int]].head()
      val parts = vs.zipWithIndex
        .map { case (v, i) => (s"p${i % nParts}", s"v$v") }.toDF("g", "v")
      val union = Sketches.hllUnion(
          Sketches.hllSketch(parts, Seq("g"), $"v"), Seq.empty, $"registers")
        .select($"registers").as[Seq[Int]].head()
      assert(union === whole, s"nParts=$nParts")
    }
  }

  test("property: ecdfNormalize is monotone in the score") {
    val genScores = Gen.listOfN(60, Gen.choose(0.0, 10.0))
    forAll(genScores, n = 15) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "s")
      val got = Sketches.ecdfNormalize(df, $"s", 0.0, 10.0, 20)
        .select($"s", $"ecdf_ppm").as[(Double, Long)].collect().sortBy(_._1)
      got.sliding(2).foreach {
        case Array((s1, p1), (s2, p2)) =>
          assert(p1 <= p2, s"ecdf not monotone: $s1->$p1 vs $s2->$p2")
        case _ =>
      }
    }
  }

  test("property: mmrRerank at lambda=1 is exactly relevance order") {
    val genCands = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)))
    } yield rows.zipWithIndex.map { case ((sim, x), i) =>
      (1L, i.toLong, sim, Array(x, 1.0 - x)) }
    forAll(genCands, n = 15) { rows =>
      val got = Similarity.mmrRerank(rows.toDF("q", "id", "sim", "v"),
          "q", "id", "sim", "v", lambda = 1.0, k = rows.size)
        .orderBy($"rank").select($"id").as[Long].collect().toList
      val expect = rows.sortBy { case (_, id, sim, _) => (-sim, id) }
        .map(_._2).toList
      assert(got === expect)
    }
  }

  test("Aho-Corasick scan equals the per-pattern sliding reference on arbitrary input") {
    val text: Gen[String] =
      Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val pat: Gen[String] = Gen.chooseNum(1, 4)
      .flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    forAll(for { t <- text; ps <- Gen.nonEmptyListOf(pat) } yield (t, ps)) {
      case (t, ps) =>
        val ac = Lexicon.Automaton.build(ps)
        val got = ac.scan(t).toSeq.groupBy(_._1).view
          .mapValues(_.size.toLong).toMap
          .map { case (pi, c) => ac.patterns(pi) -> c }
        val want = ps.distinct.map { p =>
          p -> (0 to t.length - p.length)
            .count(i => t.regionMatches(i, p, 0, p.length)).toLong
        }.filter(_._2 > 0).toMap
        assert(got === want, s"text=$t pats=$ps")
    }
  }

  test("isotonic PAV is monotone, mass-preserving, and idempotent on arbitrary bins") {
    val bins: Gen[Seq[(Long, Long, Long)]] = Gen.chooseNum(1, 15)
      .flatMap(sz => Gen.listOfN(sz,
        for { n <- Gen.chooseNum(1L, 50L); m <- Gen.chooseNum(0L, 1000000L) }
          yield (n, m * n)))
      .map(_.zipWithIndex.map { case ((n, s), i) => (i.toLong, n, s) })
    forAll(bins, n = 25) { bs =>
      def run(rows: Seq[(Long, Long, Long)]) =
        Probe.isotonicCalibrate(rows.toDF("bin", "n", "sum_label_micro"))
          .orderBy($"bin").as[(Long, Long, Long, Long)].collect().toSeq
      val out = run(bs)
      val cal = out.map(_._4)
      assert(cal == cal.sorted) // non-decreasing
      // pool means conserve mass: sum over bins of n*calibrated is
      // within a floor-loss of the raw label mass
      val mass = out.map(r => r._2 * r._4).sum
      val raw = bs.map(_._3).sum
      assert((raw - mass) >= 0 && (raw - mass) < bs.map(_._2).sum,
        s"raw=$raw pooled=$mass")
      // idempotent: calibrating the calibrated (already-monotone) bins
      // reproduces them (feed n * calibrated back as the label mass)
      val again = run(out.map(r => (r._1, r._2, r._2 * r._4)))
      assert(again.map(_._4) == cal)
    }
  }

  test("rendezvous resharding n -> m only ever moves docs to NEW shards") {
    val docs = spark.range(300).select($"id".as("doc_id"))
    forAll(for { n <- Gen.chooseNum(1, 12); d <- Gen.chooseNum(1, 6) }
        yield (n, n + d), n = 8) { case (n, m) =>
      val d2 = Corpus.rendezvousShard(
        Corpus.rendezvousShard(docs, "doc_id", n, outCol = "sn"),
        "doc_id", m, outCol = "sm")
      assert(d2.filter($"sn" =!= $"sm" && $"sm" < n).count() == 0L,
        s"n=$n m=$m")
    }
  }
}
