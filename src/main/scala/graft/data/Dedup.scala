package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions.{hash28, tokens}

/**
 * Near-duplicate detection for document corpora, four ways (exact dedup is
 * a plain `groupBy(text)` — see SparkEntry q16):
 *
 *  - word-shingle **MinHash + LSH banding**: signature → band keys →
 *    self-join on band key → exact-Jaccard verify. The classic
 *    Broder/MMDS construction; at 100 TB the band join is a shuffle on
 *    short string keys (no quadratic blow-up) and the verify step touches
 *    only candidate pairs.
 *  - **SimHash**: 28-bit portable simhash; equal values (or small Hamming
 *    distance) = near-dup cluster. One shuffle on an int key.
 *  - **exact n-gram Jaccard** within a blocking key: the quadratic
 *    ground-truth, for verify stages and small blocks.
 *  - **embedding cosine** near-dup: see [[Similarity]].
 *
 * All hashes are MD5-derived ([[TextFunctions.hash28]]) so a DuckDB oracle
 * reproduces signatures bit-for-bit.
 */
object Dedup {

  /** Large Mersenne prime 2^31−1 for the universal-hash family. */
  val P: Long = 2147483647L

  /** a_i, b_i for minhash function i — small odd multipliers keep
   * `a*h28+b` well under 2^63 (h < 2^28, a < 2^7 for k ≤ 64). */
  def hashParams(i: Int): (Long, Long) = (2L * i + 1, 7919L * i + 13)

  /** Word n-gram shingles of a token array (empty when fewer than n
   * tokens — NB Spark's `sequence(0, negative)` would count *down*). */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, (i + lit(k + 1)).cast("int"))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Distinct 28-bit shingle hashes of a text column. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(transform(wordShingles(tokens(text), n), s => hash28(s)))

  /** MinHash signature: for each of k universal hashes, the min over the
   * shingle-hash set. NULL-free input required (guard empty shingles
   * upstream). */
  def minhashSignature(hashes: Column, k: Int): Column =
    array((0 until k).map { i =>
      val (a, b) = hashParams(i)
      array_min(transform(hashes, h => (h * a + b) % P))
    }: _*)

  /** LSH band keys: signature split into `bands` rows-per-band groups,
   * each serialized to a string key (band index prefix keeps bands from
   * colliding with each other). */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      concat_ws(":",
        lit(b) +: (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** Exact Jaccard similarity of two pre-distinct array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)) /
      greatest(size(array_union(a, b)), lit(1)).cast("double")

  /** Fraction of equal signature positions — the MinHash Jaccard
   * estimate. */
  def signatureAgreement(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v) / lit(k.toDouble)

  /** 28-bit SimHash over the distinct tokens of a text column: bit j set
   * iff more than half the token hashes have bit j set. */
  def simhash(text: Column, bits: Int = 28): Column = {
    val hashes = transform(array_distinct(tokens(text)), t => hash28(t))
    val n = size(hashes)
    (0 until bits).map { j =>
      val ones = size(filter(hashes, h => shiftright(h, j) % 2 === 1))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Hamming distance between two simhash longs. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // ------------------------------------------------------- DataFrame level

  /**
   * MinHash-LSH candidate pairs with exact-Jaccard verification.
   *
   * Plan shape (scale-minded): per-doc signature (one projection, no
   * shuffle) → explode band keys → self-join on band key (shuffle on short
   * strings; the ONLY join, and it only meets docs sharing a band) →
   * dedupe pairs → exact verify on the candidate set.
   */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sigs = docs
      .select(col(idCol).as("id"), shingleHashes(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
      .withColumn("band", explode(bandKeys(col("sig"), bands, rows)))
    val a = sigs.select(col("band"), col("id").as("id_a"),
      col("sh").as("sh_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("band"), col("id").as("id_b"),
      col("sh").as("sh_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        signatureAgreement(col("sig_a"), col("sig_b"), k).as("est_jaccard"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash duplicate clusters: docs sharing an identical simhash. */
  def simhashClusters(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), simhash(col(textCol)).as("simhash"))
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("id")).as("min_id"))
      .filter(col("n_docs") > 1)

  /**
   * Exact n-gram-Jaccard near-dup pairs within a blocking key (quadratic
   * inside each block only; use [[minhashNearDups]] when no natural
   * blocking key exists).
   */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: Column,
      shingleN: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val t = docs.select(col(idCol).as("id"), blockCol.as("block"),
      shingleHashes(col(textCol), shingleN).as("sh"))
    val a = t.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = t.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
