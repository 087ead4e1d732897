package graft.plans

import graft.SparkSpec

/**
 * SQL-surface parity census: every native expression registered by
 * [[GraftExtensions]] must be callable from `spark.sql` and produce the
 * documented value on a canonical input. The census is driven off
 * `GraftExtensions.descriptors` itself — registering a new function
 * without adding a census entry (or dropping one) fails the first
 * assertion, so the SQL surface can't silently diverge from the Column
 * API surface.
 */
class SqlSurfaceSpec extends SparkSpec {

  /** name -> (canonical SQL call, expected stringified result; null
   * expected = callability-only, value pinned by the kernel's own spec). */
  private val census: Map[String, (String, String)] = Map(
    "vec_dot" -> (
      "SELECT vec_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))",
      "32.0"),
    // |{1,2,3} ∩ {2,3,4}| / |{1,2,3,4}| = 2/4
    "vec_jaccard_sorted" -> (
      "SELECT vec_jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L))",
      "0.5"),
    // sig[0] of {7}: (7·1 + 13) mod P = 20
    "vec_minhash" -> (
      "SELECT element_at(vec_minhash(array(7L), 2), 1)",
      "20"),
    // singleton {7}: sig[f] = xxhash64(7, f) — the builtin 2-arg fold
    "vec_minhash64" -> (
      "SELECT element_at(vec_minhash64(array(7L), 2), 2) = xxhash64(7L, 1L)",
      "true"),
    // first 15 nibbles of md5('a') = 0cc175b9c0f1b6a
    "md5_prefix_hash" -> (
      "SELECT md5_prefix_hash('a', 15)",
      java.lang.Long.parseLong("0cc175b9c0f1b6a", 16).toString),
    // 4 tokens, n=3 -> shingles "a b c","b c d" -> 2 distinct hashes
    "shingle_hashes" -> (
      "SELECT size(shingle_hashes(array('a','b','c','d'), 3))",
      "2"),
    // single shingle: its hash is exactly xxhash64 of the joined n-gram
    "shingle_hashes64" -> (
      "SELECT element_at(shingle_hashes64(array('a','b'), 2), 1) = xxhash64('a b')",
      "true"),
    "vec_simhash" -> (
      "SELECT vec_simhash(array('a','b','c'), 24)",
      null),
    // singleton token: every bit of the simhash is the bit of xxhash64('a')
    "vec_simhash64" -> (
      "SELECT vec_simhash64(array('a')) = xxhash64('a')",
      "true"),
    // weights layout is [w0, 4 per raw factor]
    "predict_nonlinear" -> (
      "SELECT predict_nonlinear(array(1.0d, 2.0d, 3.0d, 4.0d, 5.0d), array(0.5d))",
      null),
    // 8 chars, k=3 -> 6 gram hashes, w=4 -> 3 window minima, <=3 distinct
    "winnow_fingerprint" -> (
      "SELECT size(winnow_fingerprint('abcdefgh', 3, 4)) BETWEEN 1 AND 3",
      "true"),
    // |text|=5, k=4 -> 2 positional hashes
    "kgram_hashes" -> (
      "SELECT size(kgram_hashes('abcde', 4, 15))",
      "2"),
    // bigrams of [a,b,a,b]: "a b" x2, "b a" x1 -> 2/3
    "top_ngram_frac" -> (
      "SELECT top_ngram_frac(array('a','b','a','b'), 2)",
      (2.0 / 3).toString),
    // lut[0][1] + lut[1][0] = 20 + 30
    "pq_adc" -> (
      "SELECT pq_adc(array(1, 0), array(array(10.0d, 20.0d), array(30.0d, 40.0d)))",
      "50.0"),
    // codebook sub0 = {[0.0], [10.0]}; v=[9.0] is nearer 10 -> code 1
    "pq_encode" -> (
      "SELECT element_at(pq_encode(array(9.0d), array(array(array(0.0d), array(10.0d)))), 1)",
      "1"),
    // h=7: j=1 -> (7*3 + 7919 + 13) % 2001 - 1000 = 950 -> 0.95
    "hash_embed" -> (
      "SELECT element_at(hash_embed(array(7L), 2), 2)",
      "0.95"),
    // v=100, subBits=5: e=6, (6-5)*32 + (100 >> 1) = 82
    "log_bucket" -> (
      "SELECT log_bucket(100L, 5)",
      "82"),
    // 2-d, 1-bit U-curve: (1,0) is the last corner -> index 3
    "hilbert_index" -> (
      "SELECT hilbert_index(array(1L, 0L), 1)",
      "3"),
    // classic pair: kitten -> sitting is 3 edits, within the bound
    "lev_banded" -> (
      "SELECT lev_banded('kitten', 'sitting', 5)",
      "3"))

  test("every registered function has a census entry and answers via spark.sql") {
    val registered = GraftExtensions.functionNames
    assert(registered.sorted === census.keys.toSeq.sorted,
      "census out of sync with GraftExtensions.descriptors")
    assert(registered.size === 19)
    registered.foreach { name =>
      val (sql, expected) = census(name)
      val rows = spark.sql(sql).collect()
      assert(rows.length === 1, s"$name: $sql")
      val got = rows.head.get(0)
      assert(got != null, s"$name returned null via SQL: $sql")
      if (expected != null)
        assert(got.toString === expected, s"$name: $sql")
    }
  }

  test("lev_banded SQL surface crosses into the banded-DP fallback " +
      "(m > 64*(2*max+1)); both code paths stay pinned at the census") {
    // the census fixture ('kitten', max=5) runs the Myers/Hyyrö
    // bit-parallel kernel; these cross the width gate into the
    // Ukkonen-banded two-row DP — same SQL name, same semantics
    def one(sql: String): Int = spark.sql(sql).head().getInt(0)
    // max=0: m=100 > 64 — equality test in the fallback regime
    assert(one("SELECT lev_banded(repeat('ab', 50), repeat('ab', 50), 0)") === 0)
    assert(one("SELECT lev_banded(repeat('ab', 50), " +
      "concat(repeat('ab', 49), 'ax'), 0)") === -1)
    // max=1: m=200 > 192 — one substitution inside the band, two beyond
    assert(one("SELECT lev_banded(repeat('a', 200), " +
      "concat(repeat('a', 199), 'b'), 1)") === 1)
    assert(one("SELECT lev_banded(repeat('a', 200), " +
      "concat('b', concat(repeat('a', 198), 'b')), 1)") === -1)
  }

  test("SQL and Column-API spellings agree on a shared pipeline") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("census_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  vec_simhash(split(lower(text), ' '), 24) AS sh,
        |  size(shingle_hashes(split(lower(text), ' '), 3)) AS ns
        |FROM census_docs ORDER BY doc_id""".stripMargin).collect().toSeq
    val viaApi = docs.select(col("doc_id"),
        call_function("vec_simhash", split(lower(col("text")), " "), lit(24)).as("sh"),
        size(call_function("shingle_hashes", split(lower(col("text")), " "), lit(3))).as("ns"))
      .orderBy("doc_id").collect().toSeq
    assert(viaSql === viaApi)
  }
}
