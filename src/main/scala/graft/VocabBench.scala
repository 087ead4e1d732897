package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Production-vocab-depth evidence for the tokenizer trainers — the
 * SCALING.md rows proving [[graft.data.Bpe.trainMerges]]' driver
 * delta-maintenance and [[graft.data.Unigram.train]]'s cached-type EM
 * hold at REAL vocabulary sizes (32k merges / 32k pieces), not just the
 * toy ladders the value specs pin.
 *
 * The driver-generated corpus has only 31 word types (so merge ladders
 * exhaust at 89 — depth beyond that is free and proves nothing). This
 * harness derives a morphologically rich corpus DETERMINISTICALLY from
 * the same sf0.1 documents table, entirely in-engine: every token
 * occurrence maps through xxhash64(doc_id, position) to a Zipf-ranked
 * word id (u² shaping → pdf ∝ rank^-1/2), spelled as four syllables
 * from a 40-syllable inventory (≤ 2.56M word types sharing heavy
 * substring structure — exactly what gives BPE/unigram real merge
 * and piece candidates). Token counts and doc shapes are the corpus's
 * own; only the spelling is enriched. Prints
 * `VOCABBENCH,<trainer>,<depth>,<learned>,<seconds>` rows.
 */
object VocabBench {

  private val V = 2560000 // 40^4 four-syllable spellings

  /** Deterministic rich-vocabulary respelling of a token array column. */
  def richWords(docId: Column, toks: Column): Column = {
    val sylls = Seq(
      "ba", "ce", "di", "fo", "gu", "ha", "je", "ki", "lo", "mu",
      "na", "pe", "ri", "so", "tu", "va", "we", "xi", "yo", "zu",
      "bra", "cle", "dri", "flo", "gru", "sha", "ste", "tri", "plo", "qua",
      "kan", "rem", "sil", "tor", "ung", "vex", "wol", "yar", "zim", "nor")
    transform(toks, (_, i) => {
      val h = xxhash64(docId, i)
      // u in [0, 1) from the hash; rank = floor(V·u³) → Zipf-ish mass
      // toward low ranks (pdf ∝ rank^(1/3 − 1))
      val u = pmod(h, lit(1000000L)).cast("double") / lit(1000000.0)
      val r = floor(lit(V) * u * u).cast("int")
      val d0 = r % 40
      val d1 = floor(r / 40).cast("int") % 40
      val d2 = floor(r / 1600).cast("int") % 40
      val d3 = floor(r / 64000).cast("int")
      def syll(d: Column) = element_at(lit(sylls.toArray), d + 1)
      concat(syll(d3), syll(d2), syll(d1), syll(d0))
    })
  }

  def richCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat_ws(" ",
        richWords(col("doc_id"), split(col("text"), " "))).as("text"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rich = richCorpus(spark.read.parquet(s"$dir/documents.parquet"))
      .cache()
    val nTypes = graft.data.Bpe.wordTypes(rich, "text").count()
    println(s"VOCABBENCH,word_types,$nTypes,$nTypes,0.00")
    for (n <- Seq(1000, 8000, 32000)) {
      val t0 = System.nanoTime()
      val m = graft.data.Bpe.trainMerges(rich, "text", n, minCount = 2L)
      println(f"VOCABBENCH,bpe_merges,$n,${m.size},${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    for (v <- Seq(8000, 32000)) {
      val t0 = System.nanoTime()
      val m = graft.data.Unigram.train(rich, "text", vocabSize = v,
        maxPieceLen = 6)
      println(f"VOCABBENCH,unigram_pieces,$v,${m.size},${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    rich.unpersist()
    spark.stop()
  }
}
