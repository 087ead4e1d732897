package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-iteration evidence for the iterative graph operators on the
 * shared host co-occurrence graph (the q85/q177/q195 edges): coreness
 * with a generous cap (the early-exit decides the real round count)
 * and labelPropagation at 12 fixed rounds — both cross the
 * localCheckpoint cadence, the regime SCALING.md previously only
 * documented at 3 rounds. Not part of the shipped surface. */
object ProbeDeepGraph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val aug = concat(col("text"),
      lit(" see http://ex"), (col("doc_id") % 5).cast("string"),
      lit(".org/p/"), col("doc_id").cast("string"),
      lit(" and https://cdn.example.com/x"), (col("doc_id") % 3).cast("string"))
    val hosts = docs.select(col("doc_id"),
      explode(graft.data.TextFunctions.urlHosts(aug)).as("host"))
    val edges = graft.data.Graph.coOccurrenceEdges(hosts, "doc_id", "host")
      .cache()
    val nE = edges.count()
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val ((coreDf, rounds), tCore) = time(
      graft.data.Graph.corenessWithRounds(edges, "src", "dst", iters = 20))
    val nCore = coreDf.count()
    val (lpa, tLpa) = time {
      val out = graft.data.Graph.labelPropagation(edges, "src", "dst", 12)
      out.count()
    }
    println(f"dir=$dir edges=$nE%,d nodes=$nCore%,d")
    println(f"host coreness cap=20: converged after $rounds%d rounds, " +
      f"wall=$tCore%.2f s")
    println(f"host labelPropagation 12 fixed rounds: wall=$tLpa%.2f s " +
      f"(communities=$lpa%,d rows)")
    // the host graph is contract-bounded (a handful of nodes), so the
    // depth-at-SCALE question needs a large graph: the order–supplier
    // bipartite graph from lineitem, plus a planted 50-node path so the
    // peel/propagation frontier genuinely needs 20+ rounds — per-round
    // cost at |V| ~ 10^5 with the checkpoint cadence crossed many times
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("src"),
        (col("l_suppkey") + lit(10000000L)).as("dst"))
    val pathEdges = spark.range(49).select(
      (col("id") + lit(20000000L)).as("src"),
      (col("id") + lit(20000001L)).as("dst"))
    val big = li.unionByName(pathEdges).cache()
    val nBig = big.count()
    val ((bigCore, bigRounds), tBigCore) = time(
      graft.data.Graph.corenessWithRounds(big, "src", "dst", iters = 40))
    val nBigNodes = bigCore.count()
    val pathCoreOk = bigCore
      .filter(col("node") >= 20000000L && col("node") <= 20000050L)
      .agg(max(col("coreness"))).head.getLong(0)
    val (lpaBig, tBigLpa) = time {
      graft.data.Graph.labelPropagation(big, "src", "dst", 12).count()
    }
    println(f"big graph: edges=$nBig%,d nodes=$nBigNodes%,d")
    println(f"big coreness cap=40: converged after $bigRounds%d rounds, " +
      f"wall=$tBigCore%.2f s (${tBigCore / bigRounds}%.2f s/round); " +
      f"planted-path max coreness=$pathCoreOk%d (exact=1)")
    println(f"big labelPropagation 12 fixed rounds: wall=$tBigLpa%.2f s " +
      f"(${tBigLpa / 12}%.2f s/round, communities=$lpaBig%,d rows)")
  }
}
