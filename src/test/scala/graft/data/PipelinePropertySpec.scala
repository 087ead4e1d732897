package graft.data

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Property tests over the data-pipeline kernels (deterministic seeds; the
 * offline cache has no scalatestplus bridge, so a local forAll — the
 * [[graft.risk.PropertySpec]] harness). Spark-evaluated properties batch
 * ALL generated samples into ONE DataFrame (one job per property, not one
 * per sample); driver-side kernels iterate plainly.
 */
class PipelinePropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(1234L)
    val out = Seq.newBuilder[A]
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(out += _)
      seed = seed.next
      i += 1
    }
    out.result()
  }

  // ---- sorted-set Jaccard kernel vs a scala reference -------------------

  test("jaccardSorted == set Jaccard for random sorted distinct arrays") {
    val g = for {
      a <- Gen.listOf(Gen.chooseNum(0L, 40L))
      b <- Gen.listOf(Gen.chooseNum(0L, 40L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val ps = samples(g, 200).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val got = ps.toDF("i", "a", "b")
      .select(col("i"), Dedup.jaccardSorted(col("a"), col("b")).as("j"))
      .as[(Long, Double)].collect().toMap
    ps.foreach { case (i, a, b) =>
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val expect = if (union == 0) 0.0 else inter.toDouble / union
      assert(math.abs(got(i) - expect) < 1e-12, s"case $i")
    }
  }

  // ---- 64-bit minhash kernel vs its composable twin ---------------------

  test("minhashSignature64 fused == composable on random hash sets") {
    val g = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      .map(_.distinct.sorted)
    val ps = samples(g, 150).zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val rows = ps.toDF("i", "h")
      .select(col("i"),
        Dedup.minhashSignature64(col("h"), 8).as("f"),
        Dedup.minhashSignature64Composable(col("h"), 8).as("c"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    assert(rows.length === ps.length)
    rows.foreach { case (i, f, c) => assert(f === c, s"case $i") }
  }

  // ---- Hamilton allocation invariants ------------------------------------

  test("proportionalAllocation: sums to k, larger group never gets less") {
    val g = for {
      k <- Gen.chooseNum(0L, 40L)
      ns <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L)).map(_.take(6))
    } yield (k, ns)
    samples(g, 12).foreach { case (k, ns) =>
      val sizes = ns.zipWithIndex.map { case (n, i) => (s"g$i", n) }
        .toDF("source", "n")
      val got = Sampling.proportionalAllocation(sizes, Seq("source"), k)
        .select(col("source"), col("n"), col("quota"))
        .as[(String, Long, Long)].collect()
      val total = ns.sum
      if (total > 0) assert(got.map(_._3).sum === k, s"k=$k ns=$ns")
      else assert(got.map(_._3).sum === 0L, s"k=$k ns=$ns")
      // monotone: floor is monotone in n, and the remainder bump order
      // (remainder desc) can never give a strictly smaller group more
      for ((_, na, qa) <- got; (_, nb, qb) <- got if na > nb)
        assert(qa >= qb, s"k=$k ns=$ns: n=$na got $qa < n=$nb's $qb")
      got.foreach { case (_, n, q) => if (n == 0) assert(q === 0L) }
    }
  }

  // ---- exact selection vs sort ------------------------------------------

  test("exactKth == sorted index for random long multisets") {
    val g = for {
      xs <- Gen.nonEmptyListOf(Gen.chooseNum(-1000000L, 1000000L))
      // duplicates on purpose: ties are the hard case
      dups <- Gen.listOf(Gen.oneOf(xs))
    } yield xs ++ dups
    samples(g, 8).foreach { xs =>
      val sorted = xs.sorted
      val df = xs.toDF("v")
      for (k <- Seq(1, (xs.size + 1) / 2, xs.size)) {
        val got = Relational.exactKth(df, col("v"), k.toLong, buckets = 8)
        assert(got === sorted(k - 1), s"n=${xs.size} k=$k")
      }
    }
  }

  // ---- WordPiece encode totality ----------------------------------------

  test("wordpiece encode: every word is fully covered or a single UNK") {
    val word = Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcde".toSeq)).map(_.mkString))
    val g = Gen.nonEmptyListOf(word).map(_.take(8))
    val vocab = Seq("a", "b", "c", "##a", "##b", "##c", "##d",
      "ab", "##cd", "abc")
    val ps = samples(g, 40).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    val enc = Wordpiece.encode(ps.toDF("doc_id", "text"), "doc_id", "text", vocab)
      .groupBy(col("id"), col("word_idx"))
      .agg(concat_ws("", sort_array(collect_list(
        struct(col("piece_idx"), col("piece")))).getField("piece")).as("joined"))
      .withColumn("joined", regexp_replace(col("joined"), "##", ""))
      .as[(Long, Int, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ps.foreach { case (i, text) =>
      text.split(" ").zipWithIndex.foreach { case (w, wi) =>
        val joined = enc((i, wi))
        // totality: either the pieces rebuild the word exactly, or the
        // word is one [UNK] (chars d/e at word-initial position, or e
        // anywhere, are uncoverable by this vocab)
        assert(joined == w || joined == Wordpiece.Unk,
          s"case $i word '$w' -> '$joined'")
      }
    }
  }

  // ---- HTML extraction over generated balanced markup --------------------

  test("htmlToText: generated balanced markup extracts exactly its text") {
    val wordG = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9'))).map(_.mkString))
    val blockG = for {
      tag <- Gen.oneOf("p", "div", "h1", "li", "blockquote")
      words <- Gen.listOf(wordG).map(_.take(6))
      decor <- Gen.oneOf("none", "b", "a")
    } yield (tag, words, decor)
    val g = Gen.nonEmptyListOf(blockG).map(_.take(5))
    val ps = samples(g, 60).zipWithIndex.map { case (blocks, i) =>
      val html = blocks.map { case (tag, words, decor) =>
        val inner = decor match {
          case "b" => words.map(w => s"<b>$w</b>").mkString(" ")
          case "a" => words.map(w => s"<a href='/x'>$w</a>").mkString(" ")
          case _ => words.mkString(" ")
        }
        s"<$tag class='c$i'>$inner</$tag>"
      }.mkString
      val expect = blocks.filter(_._2.nonEmpty)
        .map(_._2.mkString(" ")).mkString("\n")
      (i.toLong, html, expect)
    }
    val got = ps.map { case (i, h, _) => (i, h) }.toDF("i", "h")
      .select(col("i"), Html.htmlToText(col("h")).as("t"))
      .as[(Long, String)].collect().toMap
    ps.foreach { case (i, _, expect) =>
      assert(got(i) === expect, s"case $i")
    }
  }
}
