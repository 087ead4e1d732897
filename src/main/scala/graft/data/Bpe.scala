package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding vocabulary induction — the tokenizer-training step
 * of an LLM data pipeline (Sennrich, Haddow & Birch 2016, "Neural Machine
 * Translation of Rare Words with Subword Units"), Spark-first.
 *
 * The scalable shape is the paper's own trick: merges are learned from
 * the WORD-TYPE table (distinct pre-tokens with corpus frequencies), which
 * is orders of magnitude smaller than the corpus — ~1e6–1e8 types for a
 * web-scale corpus vs ~1e13 running tokens. One corpus-wide aggregation
 * builds the type table ([[wordTypes]]); each merge iteration is then ONE
 * hash aggregation over the cached type table (segment with the merges
 * learned so far, count adjacent symbol pairs weighted by type frequency,
 * take the argmax — [[pairCounts]] + a 1-row collect) with driver-bounded
 * state: the merge list itself, `nMerges` string pairs. No iteration ever
 * re-reads or re-shuffles the corpus, and the per-iteration aggregate
 * output is at most |alphabet ∪ merged symbols|² rows — the k-means /
 * PQ-codebook training shape ([[Similarity.trainIvfCentroids]]).
 *
 * Pre-tokenization is the shared [[TextFunctions.bpeTokens]] regex
 * (GPT-2-style split into letter runs / digit runs / single punctuation),
 * so learned merges never cross pre-token boundaries — the same contract
 * real BPE tokenizers (GPT-2, RoBERTa) enforce with their pre-split.
 *
 * Encoding ([[encode]]) is map-only: the ranked merge list rides the UDF
 * closure (KBs — vocab-sized, like broadcast codebooks), each word is
 * segmented by applying merges in rank order, and no shuffle touches the
 * corpus. Train-once/encode-many persistence mirrors the other models:
 * [[saveMerges]]/[[loadMerges]] round-trip the ranked list as parquet.
 */
object Bpe {

  /** Pre-token word types with corpus frequencies — the one corpus pass.
   * (word, n) with n = total occurrences of the pre-token in `textCol`. */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.bpeTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Segment one word under a ranked merge list: each merge, in rank
   * order, collapses every adjacent (l, r) occurrence leftmost-first —
   * the classic BPE apply. Pure JVM kernel shared by training (pair
   * recount) and corpus encode, so the two can never disagree. */
  private[data] def segmentWord(
      word: String, merges: Seq[(String, String)]): Seq[String] = {
    // split on CODE POINTS, not UTF-16 units — an astral-plane character
    // (emoji) must stay one symbol, matching code-point `substr`/`length`
    // semantics in the SQL oracle
    var syms: Array[String] = word.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = Array.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms.toSeq
  }

  /** Adjacent symbol-pair counts over the type table after applying an
   * existing merge list — iteration k of the trainer. With `merges = Nil`
   * this is plain weighted character-bigram counting (the SQL-expressible
   * oracle surface, q86). Output: (l, r, cnt). */
  def pairCounts(
      types: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val seg = udf((w: String) => segmentWord(w, merges))
    types.select(seg(col("word")).as("syms"), col("n"))
      .filter(size(col("syms")) >= 2)
      .select(posexplode(col("syms")).as(Seq("i", "l")), col("syms"), col("n"))
      .filter(col("i") < size(col("syms")) - 1)
      .select(col("l"), element_at(col("syms"), col("i") + 2).as("r"), col("n"))
      .groupBy(col("l"), col("r")).agg(sum(col("n")).as("cnt"))
  }

  /**
   * Learn up to `nMerges` ranked merges from the corpus. Deterministic:
   * ties on count break lexicographically on (l, r); stops early when no
   * pair reaches `minCount` (merging a once-seen pair is vocabulary
   * noise). Each iteration collects exactly ONE row.
   */
  def trainMerges(
      docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val types = wordTypes(docs, textCol).cache()
    try {
      var merges = Vector.empty[(String, String)]
      var exhausted = false
      while (merges.size < nMerges && !exhausted) {
        val top = pairCounts(types, merges)
          .filter(col("cnt") >= minCount)
          .orderBy(col("cnt").desc, col("l"), col("r"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else merges = merges :+ ((top(0).getString(0), top(0).getString(1)))
      }
      merges
    } finally { types.unpersist(); () }
  }

  /** The ranked merge table as a DataFrame — the persistence / query
   * surface: (rank, l, r), rank 0 = first (highest-priority) merge. */
  def mergesDf(
      spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "l", "r")
  }

  /** Map-only corpus encode: pre-tokenize, segment each pre-token under
   * the ranked merges, flatten — adds `outCol` (array<string> subword
   * tokens). The merge list rides the closure (vocab-sized, KBs). */
  def encode(
      docs: DataFrame, textCol: String, merges: Seq[(String, String)],
      outCol: String = "bpe_tokens"): DataFrame = {
    val segAll = udf((ws: Seq[String]) =>
      ws.flatMap(w => segmentWord(w, merges)))
    docs.withColumn(outCol, segAll(TextFunctions.bpeTokens(col(textCol))))
  }

  /** Persist the ranked merge list (train-once/encode-many, like
   * [[NgramLm.saveModel]] / [[Bm25.saveModel]]). */
  def saveMerges(
      spark: SparkSession, merges: Seq[(String, String)],
      path: String): Unit =
    mergesDf(spark, merges).repartition(1).write.mode("overwrite").parquet(path)

  /** Load a persisted merge list; ranked order restored by the explicit
   * rank column (never by file order). Bounded collect: nMerges rows. */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy(col("rank"))
      .select(col("l"), col("r")).collect()
      .map(row => (row.getString(0), row.getString(1))).toSeq
}
