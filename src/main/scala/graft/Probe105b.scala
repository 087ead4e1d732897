package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the q105 pre-verify filter design: per LSH
 * candidate pair, the banded Levenshtein verdict vs the values of
 * candidate NO-LOSS lower bounds on edit distance —
 *   ukk3 = char-3-gram multiset L1 / 6   (Ukkonen 1992: lev >= L1/(2q))
 *   ukk1 = char histogram L1 / 2         (q = 1 special case)
 *   dlen = |len_a - len_b|               (the existing length band)
 * A bound prunes a pair iff its value > maxDist (500). Evidence
 * generator for SCALING.md; not part of the shipped surface. */
object Probe105b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cands = graft.data.Dedup.minhashNearDupsWithLen(
        docs, "doc_id", "text", threshold = 0.0)
      .select(col("id_a"), col("id_b"), col("len_a"), col("len_b"),
        col("jaccard"))
    val gramL1 = udf { (a: String, b: String, q: Int) =>
      def grams(s: String): scala.collection.mutable.HashMap[Long, Int] = {
        val m = scala.collection.mutable.HashMap.empty[Long, Int]
        var i = 0
        while (i + q <= s.length) {
          var h = 1125899906842597L
          var k = 0
          while (k < q) { h = h * 31 + s.charAt(i + k); k += 1 }
          m.update(h, m.getOrElse(h, 0) + 1)
          i += 1
        }
        m
      }
      val ma = grams(a); val mb = grams(b)
      var l1 = 0L
      (ma.keySet ++ mb.keySet).foreach { k =>
        l1 += math.abs(ma.getOrElse(k, 0) - mb.getOrElse(k, 0)) }
      l1
    }
    val txt = docs.select(col("doc_id").as("id"), col("text"))
    val p = cands
      .join(txt.select(col("id").as("id_a"), col("text").as("ta")), Seq("id_a"))
      .join(txt.select(col("id").as("id_b"), col("text").as("tb")), Seq("id_b"))
      .select(col("jaccard"),
        abs(col("len_a") - col("len_b")).as("dlen"),
        levenshtein(col("ta"), col("tb"), 500).as("lev"),
        (gramL1(col("ta"), col("tb"), lit(3)) / lit(6)).as("ukk3"),
        (gramL1(col("ta"), col("tb"), lit(1)) / lit(2)).as("ukk1"))
      .cache()
    val n = p.count()
    val passed = p.filter(col("lev") >= 0).count()
    val pr3 = p.filter(col("ukk3") > 500).count()
    val pr1 = p.filter(col("ukk1") > 500).count()
    println(s"PROBE105B,total=$n,lev_pass=$passed,prune_ukk3=$pr3,prune_ukk1=$pr1")
    // bound soundness on this corpus: no pruned pair may be a passer
    val bad = p.filter(col("lev") >= 0 && col("ukk3") > 500).count()
    println(s"PROBE105B,sound_violations=$bad")
    p.filter(col("lev") < 0)
      .select(expr("percentile(ukk3, array(0.1,0.5,0.9))").as("ukk3_q"),
        expr("percentile(ukk1, array(0.1,0.5,0.9))").as("ukk1_q"),
        expr("percentile(jaccard, array(0.1,0.5,0.9))").as("jac_q"))
      .show(false)
    p.filter(col("lev") >= 0)
      .select(expr("percentile(ukk3, array(0.5,0.9,1.0))").as("ukk3_q_pass"),
        expr("percentile(lev, array(0.5,0.9))").as("lev_q_pass"))
      .show(false)
    spark.stop()
  }
}
