package graft.data

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LexiconSpec extends SparkSpec {
  import spark.implicits._

  test("automaton finds overlapping and nested occurrences") {
    val ac = Lexicon.Automaton.build(Seq("ana", "an", "banana", "na"))
    val hits = ac.scan("banana").toSeq
      .map { case (p, end) => (ac.patterns(p), end) }
    // banana: an@2, ana@3, na@3, an@4, ana@5, na@5, banana@5
    assert(hits.sorted == Seq(
      ("an", 2), ("an", 4), ("ana", 3), ("ana", 5),
      ("banana", 5), ("na", 3), ("na", 5)).sorted, hits.toString)
  }

  test("scanCounts matches a brute-force per-pattern substring count") {
    val lex = Seq("ab", "ba", "aba", "cc", "c")
    val texts = (0L until 40L).map { i =>
      val r = new scala.util.Random(i)
      (i, (0 until 30).map(_ => "abc" (r.nextInt(3))).mkString)
    }
    def brute(t: String, p: String): Long =
      (0 to t.length - p.length).count(i => t.regionMatches(i, p, 0, p.length)).toLong
    val got = Lexicon.scanCounts(texts.toDF("id", "text"), "id", "text", lex)
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    val expect = texts.map { case (i, t) =>
      val per = lex.map(p => brute(t, p))
      (i, per.sum, per.count(_ > 0).toLong)
    }
    assert(got == expect)
  }

  test("scanTerms explodes exact per-term counts; zero-hit docs absent") {
    val docs = Seq((1L, "xxabxyzabx"), (2L, "qqq"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Lexicon.scanTerms(docs, "id", "text", Seq("ab", "x"))
      .orderBy($"id", $"term").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "ab", 2L), (1L, "x", 4L)))
  }

  test("null text scans as zero hits, row kept") {
    val docs = Seq((1L, "the thing"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = Lexicon.scanCounts(docs, "id", "text", Seq("th", "ing"))
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2L), (2L, 0L, 0L)))
  }

  test("duplicate lexicon entries collapse; empty lexicon/pattern rejected") {
    val ac = Lexicon.Automaton.build(Seq("ab", "ab", "b"))
    assert(ac.patterns.toSeq == Seq("ab", "b"))
    intercept[IllegalArgumentException](Lexicon.Automaton.build(Nil))
    intercept[IllegalArgumentException](Lexicon.Automaton.build(Seq("a", "")))
  }
}
