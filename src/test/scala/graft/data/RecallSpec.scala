package graft.data

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Recall gates for every approximate operator, measured against its exact
 * twin on the driver-generated sf0.01 tables.
 *
 * These close the one class of silent breakage the hash oracles cannot
 * catch: the DuckDB twins reproduce the Spark plan's buckets/bands exactly,
 * so a parameter or hash regression that craters retrieval quality stays
 * oracle-green. Floors are empirical at the pinned params (measured, then
 * set with margin); the degradation tests prove each gate has teeth by
 * showing a deliberately weakened configuration falls below it.
 */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def pairs(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a).cast("long"), col(b).cast("long"))
      .as[(Long, Long)].collect().toSet

  private def recall(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double = {
    assert(exact.nonEmpty, "ground truth must not be empty")
    (approx & exact).size.toDouble / exact.size
  }

  // ---- ANN top-k vs brute force ------------------------------------------
  private lazy val annQueries = emb.filter($"vec_id" < 20)
  private lazy val annExact =
    pairs(Similarity.bruteForceTopK(annQueries, emb, "vec_id", "v", k = 3),
      "query_id", "neighbor_id")

  test("lshTopK multi-table recall@3 meets the floor; single-table does not") {
    // this corpus is near-orthogonal (true top-3 sims ~0.3), so the recall
    // configuration needs short codes and many tables: 4 planes x 16 tables
    // gives per-pair collision 1-(1-(1-θ/π)^4)^16 ≈ 0.89 at sim 0.3.
    // q27's 8-planes/1-table params are a bucket-parity oracle pin, not a
    // recall configuration (measured 0.00 here).
    val multi = recall(pairs(
      Similarity.lshTopK(annQueries, emb, "vec_id", "v", k = 3,
        numPlanes = 4, dim = 64, numTables = 16),
      "query_id", "neighbor_id"), annExact)
    val single = recall(pairs(
      Similarity.lshTopK(annQueries, emb, "vec_id", "v", k = 3,
        numPlanes = 4, dim = 64),
      "query_id", "neighbor_id"), annExact)
    info(f"lsh recall@3: 4 planes x 16 tables = $multi%.3f, x1 table = $single%.3f")
    assert(multi >= 0.6, f"multi-table LSH recall $multi%.3f below 0.6 floor")
    assert(multi > single, "OR-amplification must raise recall over one table")
  }

  test("lshTopK gate has teeth: over-sharded planes crater recall") {
    // 16 planes over 500 vectors -> ~2^16 buckets, nearly all singletons
    val degraded = recall(pairs(
      Similarity.lshTopK(annQueries, emb, "vec_id", "v", k = 3,
        numPlanes = 16, dim = 64),
      "query_id", "neighbor_id"), annExact)
    info(f"lsh recall@3 with 16 planes, 1 table = $degraded%.3f")
    assert(degraded < 0.6, "degraded params should fall below the gate")
  }

  test("ivfTopK recall@3 meets the floor; full probe is exact") {
    // q27b's nProbe=2 is an oracle pin (measured 0.40 here); the recall
    // configuration probes half the cells
    val ivf = recall(pairs(
      Similarity.ivfTopK(annQueries, emb, "vec_id", "v", k = 3,
        nCells = 8, nProbe = 4, dim = 64),
      "query_id", "neighbor_id"), annExact)
    // probing every cell makes the candidate set the whole corpus
    val full = recall(pairs(
      Similarity.ivfTopK(annQueries, emb, "vec_id", "v", k = 3,
        nCells = 8, nProbe = 8, dim = 64),
      "query_id", "neighbor_id"), annExact)
    info(f"ivf recall@3: nProbe=4 -> $ivf%.3f, nProbe=8 -> $full%.3f")
    assert(ivf >= 0.6, f"IVF recall $ivf%.3f below 0.6 floor")
    assert(full == 1.0, "nProbe = nCells must recover the exact top-k")
  }

  test("truncated-dim (Matryoshka) shortlist recall; too-short prefix has teeth") {
    import org.apache.spark.sql.functions.slice
    def shortlistRecall(dims: Int, shortlist: Int): Double = {
      val pre = emb.select($"vec_id", slice($"v", 1, dims).as("v"))
      val cand = pairs(Similarity.bruteForceTopK(
        pre.filter($"vec_id" < 20), pre, "vec_id", "v", k = shortlist),
        "query_id", "neighbor_id")
      recall(cand, annExact)
    }
    // q74's shortlist-20 is the oracle pin (measured 0.40 here — these
    // near-orthogonal embeddings put little top-3 signal in any prefix);
    // the recall configuration widens the shortlist, like refine=50 for PQ
    val d16 = shortlistRecall(16, 50)
    val d4 = shortlistRecall(4, 50)
    info(f"matryoshka shortlist-50 recall@3: 16 of 64 dims = $d16%.3f, 4 dims = $d4%.3f")
    assert(d16 >= 0.6, f"16-dim prefix recall $d16%.3f below 0.6 floor")
    assert(d4 < d16, "a 4-dim prefix must lose recall vs 16 dims")
  }

  // ---- near-dup pair recall ----------------------------------------------
  test("minhash banding pair-recall meets the floor; one band does not") {
    // exact twin: all-pairs jaccard in a single block (identical shingle +
    // jaccard code paths, no banding)
    val exact = pairs(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", lit(0),
        shingleN = 3, threshold = 0.3),
      "id_a", "id_b")
    val banded = recall(pairs(
      Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, threshold = 0.3),
      "id_a", "id_b"), exact)
    // bands=1 means all 16 minhashes must agree -- AND-only amplification
    val degraded = recall(pairs(
      Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 1, threshold = 0.3),
      "id_a", "id_b"), exact)
    info(f"minhash pair-recall: 4 bands = $banded%.3f, 1 band = $degraded%.3f")
    assert(banded >= 0.6, f"minhash pair-recall $banded%.3f below 0.6 floor")
    assert(degraded < banded, "single-band AND must lose recall vs banding")
  }

  test("minhash 64-bit production tier meets the same pair-recall floor") {
    // the xxhash64 family (hashBits = 64) is the whole-corpus spelling —
    // different signatures, same banding math, so it must clear the same
    // empirical floor against the same exact twin as the 28-bit gate
    val exact = pairs(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", lit(0),
        shingleN = 3, threshold = 0.3),
      "id_a", "id_b")
    val banded = recall(pairs(
      Dedup.minhashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, threshold = 0.3, hashBits = 64),
      "id_a", "id_b"), exact)
    info(f"minhash64 pair-recall: 4 bands = $banded%.3f")
    assert(banded >= 0.6, f"minhash64 pair-recall $banded%.3f below 0.6 floor")
  }

  test("bucketed cosine near-dup pair-recall meets the floor with tables") {
    val exact = pairs(
      Similarity.cosineNearDupPairs(emb, "vec_id", "v", threshold = 0.4),
      "id_a", "id_b")
    val multi = recall(pairs(
      Similarity.cosineNearDupPairsBucketed(emb, "vec_id", "v", threshold = 0.4,
        numPlanes = 4, dim = 64, numTables = 16),
      "id_a", "id_b"), exact)
    val single = recall(pairs(
      Similarity.cosineNearDupPairsBucketed(emb, "vec_id", "v", threshold = 0.4,
        numPlanes = 8, dim = 64),
      "id_a", "id_b"), exact)
    info(f"cosine near-dup pair-recall: 4 planes x 16 tables = $multi%.3f, " +
      f"8 planes x 1 table = $single%.3f")
    assert(multi >= 0.6, f"bucketed near-dup recall $multi%.3f below 0.6 floor")
    assert(single < 0.6, "q25b's single-table params sit below the gate " +
      "by design (bucket-parity oracle, not a recall configuration)")
  }

  test("lshRecallReport agrees with the spec-computed recall; full recall at 0 planes") {
    import org.apache.spark.sql.functions.col
    val exact = pairs(
      Similarity.cosineNearDupPairs(emb, "vec_id", "v", threshold = 0.4),
      "id_a", "id_b")
    val report = Similarity.lshRecallReport(emb, "vec_id", "v",
        threshold = 0.4, numPlanes = 8, dim = 64)
      .select(col("n_true"), col("n_found"), col("recall_ppm"))
      .as[(Long, Long, Long)].head()
    assert(report._1 === exact.size.toLong)
    // the report's ppm equals the independently-computed set recall
    val specRecall = recall(pairs(
      Similarity.cosineNearDupPairsBucketed(emb, "vec_id", "v", 0.4, 8, 64),
      "id_a", "id_b"), exact)
    assert(report._3 === (report._2 * 1000000L) / report._1)
    assert(math.abs(report._3 / 1e6 - specRecall) < 1e-6)
    // a 1-plane config buckets coarsely (2 buckets) -> near-full recall
    val loose = Similarity.lshRecallReport(emb, "vec_id", "v", 0.4, 1, 64)
      .select(col("recall_ppm")).as[Long].head()
    assert(loose > report._3)
  }
}
