package graft.data

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Epoch shuffle (deterministic per-epoch corpus permutation) and
  * hard-negative mining (DPR-style different-label top-k). */
class ShuffleMiningSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    spark.range(n).select($"id".as("doc_id"), concat(lit("doc "), $"id").as("text"))

  test("epochShuffle is a total permutation: contiguous pos per shard, all ids kept") {
    val out = Corpus.epochShuffle(docs(500), "doc_id", epoch = 1L, nShards = 8)
      .select($"doc_id", $"shard", $"pos").cache()
    assert(out.count() == 500)
    assert(out.select($"doc_id").distinct().count() == 500)
    assert(out.select($"shard", $"pos").distinct().count() == 500)
    // pos is 1..count(shard) with no gaps: max == count and min == 1 per shard
    val perShard = out.groupBy($"shard")
      .agg(count("*").as("n"), min($"pos").as("lo"), max($"pos").as("hi"))
      .collect()
    assert(perShard.length == 8, "500 rows over 8 hash shards: none empty")
    perShard.foreach { r =>
      assert(r.getLong(2) == 1L && r.getLong(3) == r.getLong(1), r.toString)
    }
    out.unpersist()
  }

  test("epochShuffle is deterministic and partition-order invariant") {
    val base = Corpus.epochShuffle(docs(300), "doc_id", epoch = 7L, nShards = 4)
      .select($"doc_id", $"shard", $"pos")
    val scrambled = Corpus.epochShuffle(
        docs(300).repartition(11).sortWithinPartitions(desc("doc_id")),
        "doc_id", epoch = 7L, nShards = 4)
      .select($"doc_id", $"shard", $"pos")
    assert(base.except(scrambled).isEmpty && scrambled.except(base).isEmpty)
  }

  test("epochShuffle: different epochs induce different permutations") {
    val e1 = Corpus.epochShuffle(docs(300), "doc_id", epoch = 1L, nShards = 4)
      .select($"doc_id", $"shard", $"pos")
    val e2 = Corpus.epochShuffle(docs(300), "doc_id", epoch = 2L, nShards = 4)
      .select($"doc_id", $"shard", $"pos")
    // both valid permutations, but the (shard, pos) assignment differs for
    // most docs — a re-keyed hash can't agree except by 1/(4*|shard|) luck
    val agree = e1.as("a").join(e2.as("b"), Seq("doc_id", "shard", "pos")).count()
    assert(agree < 30, s"$agree of 300 docs kept their slot across epochs")
  }

  test("totalVariationByGroup: identical=0, disjoint=1e6, missing buckets=0 share") {
    val rows = (
      // g1 and g2: identical distributions (2 buckets, 50/50)
      Seq(("g1", 0L), ("g1", 1L), ("g2", 0L), ("g2", 1L)) ++
      // g3: all mass in bucket 2 (disjoint from g1/g2)
      Seq(("g3", 2L), ("g3", 2L))
    ).toDF("g", "bkt")
    val got = Corpus.totalVariationByGroup(rows, "g", "bkt")
      .orderBy($"a", $"b").as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("g1", "g2", 0L), ("g1", "g3", 1000000L), ("g2", "g3", 1000000L)))
  }

  test("totalVariationByGroup matches a scalar mirror on a skewed fixture") {
    val rows = (0 until 300).map(i =>
      (s"s${i % 3}", ((i * i + i / 3) % 7).toLong)).toDF("g", "bkt")
    val got = Corpus.totalVariationByGroup(rows, "g", "bkt")
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val data = (0 until 300).map(i => (s"s${i % 3}", ((i * i + i / 3) % 7).toLong))
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val buckets = data.map(_._2).distinct
    def ppm(g: String) = {
      val n = byG(g).size.toLong
      buckets.map(b => b -> byG(g).count(_ == b).toLong * 1000000L / n).toMap
    }
    for (a <- byG.keys; b <- byG.keys if a < b) {
      val want = buckets.map(k => math.abs(ppm(a)(k) - ppm(b)(k))).sum / 2
      assert(got((a, b)) == want, s"$a vs $b")
    }
  }

  test("hardNegatives returns only different-label neighbors, in cosine order") {
    // axis-aligned vectors make cosine exact: same axis = 1, else 0;
    // anchor 0 is label A, surrounded by A's — negatives must skip them all
    val rows = Seq(
      (0L, Array(1.0, 0.0, 0.0), "A"),
      (1L, Array(1.0, 0.0, 0.0), "A"),   // same label: never a negative
      (2L, Array(0.9, 0.1, 0.0), "A"),   // same label: never a negative
      (3L, Array(0.8, 0.2, 0.0), "B"),   // closest different-label
      (4L, Array(0.5, 0.5, 0.0), "B"),
      (5L, Array(0.0, 1.0, 0.0), "C"),
      (6L, Array(0.0, 0.0, 1.0), null.asInstanceOf[String]) // unknown: excluded
    ).toDF("id", "v", "label")
    val out = Similarity.hardNegatives(
        rows.filter($"id" === 0), rows, "id", "v", "label", k = 3)
      .orderBy($"rank")
      .select($"neighbor_id", $"rank").as[(Long, Int)].collect()
    assert(out.toSeq == Seq((3L, 1), (4L, 2), (5L, 3)), out.mkString(","))
  }

  test("hardNegatives: a NULL-labeled anchor emits no rows") {
    // an unknown anchor label can't certify ANYTHING a negative — the
    // same rule the corpus side already enforces; without the anchor-side
    // filter every labeled row would count as "differing" via <=>
    val rows = Seq(
      (0L, Array(1.0, 0.0), null.asInstanceOf[String]),
      (1L, Array(1.0, 0.1), "A"),
      (2L, Array(0.9, 0.2), "B")
    ).toDF("id", "v", "label")
    val out = Similarity.hardNegatives(
      rows.filter($"id" === 0), rows, "id", "v", "label", k = 5)
    assert(out.count() == 0L)
    // a labeled anchor against the same corpus still mines normally
    val out2 = Similarity.hardNegatives(
        rows.filter($"id" === 1), rows, "id", "v", "label", k = 5)
      .select($"neighbor_id").as[Long].collect().toSet
    assert(out2 == Set(2L))
  }

  test("hardNegatives: shuffle and broadcast plans agree") {
    val rows = (0L until 40L).map { i =>
      (i, Array(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1)),
        if (i % 3 == 0) "x" else "y")
    }.toDF("id", "v", "label")
    val anchors = rows.filter($"id" < 4)
    val b = Similarity.hardNegatives(anchors, rows, "id", "v", "label",
      k = 5, broadcastAnchors = true)
    val s = Similarity.hardNegatives(anchors, rows, "id", "v", "label",
      k = 5, broadcastAnchors = false)
    val cols = Seq("query_id", "rank", "neighbor_id")
    assert(b.select(cols.map(col): _*).except(s.select(cols.map(col): _*)).isEmpty)
    assert(s.select(cols.map(col): _*).except(b.select(cols.map(col): _*)).isEmpty)
  }
}
