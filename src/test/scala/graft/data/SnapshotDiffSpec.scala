package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff: the four statuses on a hand-built pair of
 * versions, whitespace-insensitive change detection (fingerprint is
 * normalized), null-text handling, and the narrow-projection plan.
 */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon zeta"),
    (3L, "eta theta iota"),
    (4L, "kappa lambda mu")).toDF("id", "text")

  private lazy val newSnap = Seq(
    (2L, "delta   epsilon zeta "), // whitespace only -> unchanged
    (3L, "eta theta iota REVISED"),
    (4L, "kappa lambda mu"),
    (5L, "nu xi omicron")).toDF("id", "text")

  test("statuses: added, removed, changed, unchanged") {
    val got = Corpus.snapshotDiff(oldSnap, newSnap)
      .select(col("id"), col("status")).as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
  }

  test("fingerprints carried as evidence, null on the absent side") {
    val rows = Corpus.snapshotDiff(oldSnap, newSnap)
      .select(col("id"), col("fp_old"), col("fp_new"))
      .collect().map(r => r.getLong(0) -> ((r.isNullAt(1), r.isNullAt(2)))).toMap
    assert(rows(1L) === ((false, true)))  // removed: no new fp
    assert(rows(5L) === ((true, false)))  // added: no old fp
    assert(rows(3L) === ((false, false)))
  }

  test("null text fingerprints as empty, not null status logic") {
    val o = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val n = Seq((1L, "")).toDF("id", "text")
    val got = Corpus.snapshotDiff(o, n)
      .select(col("status")).as[String].head()
    assert(got === "unchanged") // null normalizes to the empty fingerprint
  }

  test("the join carries only (id, fp, flag) — text never crosses the exchange") {
    val p = Corpus.snapshotDiff(oldSnap, newSnap)
      .queryExecution.executedPlan.toString
    // both exchange inputs are the narrow projection, so no plan node
    // above a scan references the text attribute
    val afterExchange = p.split("Exchange").head
    assert(!afterExchange.contains("text#"), p.take(2000))
  }

  test("tokenDrift: exact ppm bookkeeping on a hand-checked corpus") {
    // before: 4 tokens total (a a b c); after: 5 tokens (a b b b d)
    val before = Seq((1L, "a a b"), (2L, "c")).toDF("id", "text")
    val after = Seq((1L, "a b b"), (2L, "b d")).toDF("id", "text")
    val out = Corpus.tokenDrift(before, after, "text", topK = 10)
      .select(col("tok"), col("n_before"), col("n_after"),
        col("ppm_before"), col("ppm_after"), col("delta_ppm"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set("a", "b", "c", "d"))
    assert(out("a") === (("a", 2L, 1L, 500000L, 200000L, -300000L)))
    assert(out("b") === (("b", 1L, 3L, 250000L, 600000L, 350000L)))
    assert(out("c") === (("c", 1L, 0L, 250000L, 0L, -250000L)))
    assert(out("d") === (("d", 0L, 1L, 0L, 200000L, 200000L)))
  }

  test("tokenDrift topK truncates by |delta| with token tie-break") {
    val before = Seq((1L, "x x y z")).toDF("id", "text")
    val after = Seq((1L, "y y x z")).toDF("id", "text")
    // deltas: x -250000, y +250000, z 0 -> top-2 is (x, y) by tie-break
    val toks = Corpus.tokenDrift(before, after, "text", topK = 2)
      .select(col("tok")).as[String].collect().toSet
    assert(toks === Set("x", "y"))
  }

  test("tokenDrift floor-division matches `div` semantics (no rounding up)") {
    // 1 of 3 tokens = 333333.33... ppm -> floor 333333, never 333334
    val before = Seq((1L, "p q r")).toDF("id", "text")
    val after = Seq((1L, "p")).toDF("id", "text")
    val ppm = Corpus.tokenDrift(before, after, "text", topK = 10)
      .filter(col("tok") === "q").select(col("ppm_before")).as[Long].head()
    assert(ppm === 333333L)
  }
}
