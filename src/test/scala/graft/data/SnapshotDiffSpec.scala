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
}
