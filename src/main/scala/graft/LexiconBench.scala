package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Lexicon-depth evidence for `SCALING.md`: Aho-Corasick scan wall-time
 * at 8 / 1,000 / 10,000 terms over the sf0.1 documents (warmup + min of
 * 2, the [[Scale]] protocol). The claim under test: scan cost is
 * O(text + matches) — FLAT in lexicon size — where a per-pattern regex
 * chain scales linearly in |lexicon| passes. Terms are deterministic
 * 5–8-char lowercase strings (Weyl-sequence spelled base-26), so the
 * run reproduces anywhere.
 */
object LexiconBench {
  private def term(i: Int): String = {
    var x = i.toLong * 2654435761L + 1013904223L
    val len = 5 + (x % 4).toInt
    val sb = new StringBuilder
    (0 until len).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      sb += ('a' + math.floorMod(x, 26L).toInt).toChar
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .cache()
    docs.count()
    for (n <- Seq(8, 1000, 10000)) {
      val terms = (0 until n).map(term).distinct
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.data.Lexicon.scanCounts(docs, "doc_id", "lt", terms)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      println(f"LEXBENCH,$n,${math.min(once(), once())}%.3f")
    }
    spark.stop()
  }
}
