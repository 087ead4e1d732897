package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Incremental corpus-card maintenance ([[Corpus.cardUpdate]]): the
 * updated card equals a full recompute on the new snapshot for every
 * combination of add/remove/change, an empty diff is the identity, and
 * the delta passes scan only the changed documents.
 */
class CardUpdateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon"),
    (3L, ""),
    (4L, "kappa lambda mu nu")).toDF("id", "text")
  private lazy val newSnap = Seq(
    (1L, "alpha beta gamma"),          // unchanged
    (2L, "delta epsilon zeta added"),  // changed (+2 tokens)
    (4L, "kappa lambda mu nu"),        // unchanged
    (5L, "brand new doc"),             // added
    (6L, "")).toDF("id", "text")       // added empty; 3 removed

  private def cardMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("incremental update equals full recompute") {
    val updated = cardMap(Corpus.cardUpdate(
      Corpus.cardDecomposable(oldSnap, "text"), oldSnap, newSnap))
    val full = cardMap(Corpus.cardDecomposable(newSnap, "text"))
    assert(updated === full)
    assert(updated("n_docs") === 5L)
    assert(updated("n_empty_docs") === 1L)
  }

  test("empty diff is the identity") {
    val updated = cardMap(Corpus.cardUpdate(
      Corpus.cardDecomposable(oldSnap, "text"), oldSnap, oldSnap))
    assert(updated === cardMap(Corpus.cardDecomposable(oldSnap, "text")))
  }

  test("pure removal subtracts exactly") {
    val shrunk = oldSnap.filter(col("id") =!= 4L)
    val updated = cardMap(Corpus.cardUpdate(
      Corpus.cardDecomposable(oldSnap, "text"), oldSnap, shrunk))
    assert(updated === cardMap(Corpus.cardDecomposable(shrunk, "text")))
    assert(updated("n_tokens") ===
      cardMap(Corpus.cardDecomposable(oldSnap, "text"))("n_tokens") - 4L)
  }

  test("tokenCountsUpdate equals full recompute; zero-count tokens drop out") {
    val updated = Corpus.tokenCountsUpdate(
        Corpus.tokenCounts(oldSnap, "text"), oldSnap, newSnap)
      .as[(String, Long)].collect().toMap
    val full = Corpus.tokenCounts(newSnap, "text")
      .as[(String, Long)].collect().toMap
    assert(updated === full)
    // 'eta'/'theta'/'iota' existed only in removed doc 3... doc 3 was
    // empty here; 'zeta' gained by the change, removed doc tokens gone
    assert(!updated.contains("iota") || full.contains("iota"))
  }

  test("tokenCountsUpdate: removal-only and identity cases") {
    val shrunk = oldSnap.filter(col("id") =!= 4L)
    val upd = Corpus.tokenCountsUpdate(
        Corpus.tokenCounts(oldSnap, "text"), oldSnap, shrunk)
      .as[(String, Long)].collect().toMap
    assert(upd === Corpus.tokenCounts(shrunk, "text")
      .as[(String, Long)].collect().toMap)
    assert(!upd.contains("kappa")) // count reached zero -> row absent
    val same = Corpus.tokenCountsUpdate(
        Corpus.tokenCounts(oldSnap, "text"), oldSnap, oldSnap)
      .as[(String, Long)].collect().toMap
    assert(same === Corpus.tokenCounts(oldSnap, "text")
      .as[(String, Long)].collect().toMap)
  }

  test("cardBySource: hand-checked per-source rows with exact dup ppm") {
    val docs = Seq(
      (1L, "srcA", "alpha beta"),
      (2L, "srcA", "alpha  beta"),   // whitespace-normalized dup of 1
      (3L, "srcA", "gamma"),
      (4L, "srcB", ""),
      (5L, "srcB", "delta epsilon zeta")).toDF("id", "source", "text")
    val got = Corpus.cardBySource(docs, "source", "text")
      .orderBy(col("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_empty_docs"), col("n_distinct_fingerprints"), col("dup_ppm"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got === List(
      // srcA: 3 docs, 5 tokens, 10+11+5 chars, fp dup -> 2 distinct,
      // dup_ppm = 1e6/3 floored
      ("srcA", 3L, 5L, 26L, 0L, 2L, 333333L),
      // the empty doc counts 1 "token" (split('') = ['']) — the shared
      // token contract with the q102 card and the DuckDB mirror
      ("srcB", 2L, 4L, 18L, 1L, 2L, 0L)))
  }

  test("whitespace-only edits count as changed (exact hash, not the dedup fingerprint)") {
    // snapshotDiff's normalized fingerprint would call this 'unchanged',
    // but n_chars shifts — cardUpdate diffs on the exact hash, so the
    // maintained card still equals a full recompute
    val ws = oldSnap.withColumn("text",
      when(col("id") === 1L, lit("alpha  beta  gamma")).otherwise(col("text")))
    val updated = cardMap(Corpus.cardUpdate(
      Corpus.cardDecomposable(oldSnap, "text"), oldSnap, ws))
    assert(updated === cardMap(Corpus.cardDecomposable(ws, "text")))
    assert(updated("n_chars") ===
      cardMap(Corpus.cardDecomposable(oldSnap, "text"))("n_chars") + 2L)
  }
}
