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

  test("gopherStats and topNgramFraction on empty text") {
    val r = Seq("").toDF("text").select(
        TextFunctions.gopherStats(col("text"))("mean_word_len").as("mwl"),
        TextFunctions.topNgramFraction(col("text"), 3).as("t3"))
      .as[(Double, Double)].head()
    assert(r._1 === 0.0 && r._2 === 0.0)
  }
}
