package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Sign-bit binary quantization ([[Pq.signBits]] / [[Pq.binaryTopK]]):
 * packing matches a scalar reference at awkward dims, Hamming over words
 * equals the naive sign-mismatch count, and with a full-corpus refine the
 * two-stage search degenerates to exact brute force.
 */
class BinaryAnnSpec extends SparkSpec {
  import spark.implicits._

  private def refBits(v: Array[Double]): Seq[Long] =
    v.grouped(64).map { w =>
      w.zipWithIndex.foldLeft(0L) { case (acc, (x, d)) =>
        if (x > 0) acc | (1L << d) else acc
      }
    }.toSeq

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Double])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
  }

  test("signBits packs like the scalar reference at dims 1, 63, 64, 65, 130") {
    for (dim <- Seq(1, 63, 64, 65, 130)) {
      val vs = randVecs(6, dim, seed = dim)
      val got = vs.toDF("id", "v")
        .select(col("id"), Pq.signBits(col("v")).as("code"))
        .as[(Long, Seq[Long])].collect().toMap
      vs.foreach { case (id, v) =>
        assert(got(id) === refBits(v), s"dim=$dim id=$id")
      }
    }
  }

  test("zeros and negatives clear bits (strict > 0 matches the oracle)") {
    val v = Array(0.0, -1.0, 2.0, -0.0)
    val got = Seq((1L, v)).toDF("id", "v")
      .select(Pq.signBits(col("v"))).as[Seq[Long]].head()
    assert(got === Seq(4L))
  }

  test("empty vector yields an empty code instead of an element_at error") {
    // size 0 would make the word range sequence(0,-1) = [0,-1] and the
    // inner aggregate would call element_at(v, 0) -> runtime error; the
    // guard maps it to an empty code (Hamming 0 vs itself)
    val got = Seq((1L, Array.empty[Double])).toDF("id", "v")
      .select(Pq.signBits(col("v"))).as[Seq[Long]].head()
    assert(got === Seq.empty[Long])
    val h = Seq((1L, Array.empty[Double], Array.empty[Double]))
      .toDF("id", "a", "b")
      .select(Pq.hammingDist(Pq.signBits(col("a")), Pq.signBits(col("b"))))
      .as[Long].head()
    assert(h === 0L)
  }

  test("hammingDist equals the naive sign-mismatch count") {
    val vs = randVecs(10, 130, seed = 9)
    val pairs = for (a <- vs; b <- vs if a._1 < b._1) yield (a, b)
    val df = pairs.map { case ((ia, va), (ib, vb)) => (ia, ib, va, vb) }
      .toDF("id_a", "id_b", "v_a", "v_b")
    val got = df.select(col("id_a"), col("id_b"),
        Pq.hammingDist(Pq.signBits(col("v_a")), Pq.signBits(col("v_b"))))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    pairs.foreach { case ((ia, va), (ib, vb)) =>
      val naive = va.zip(vb).count { case (x, y) => (x > 0) != (y > 0) }
      assert(got((ia, ib)) === naive.toLong, s"($ia,$ib)")
    }
  }

  test("full-corpus refine degenerates to exact brute force") {
    val vs = randVecs(30, 64, seed = 3).toDF("vec_id", "v")
    val queries = vs.filter(col("vec_id") < 4)
    val got = Pq.binaryTopK(queries, vs, "vec_id", "v", k = 5, refine = 6)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(queries, vs, "vec_id", "v", k = 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got === want)
  }

  test("float vectors never ride the Hamming scan") {
    val vs = randVecs(20, 64, seed = 5).toDF("vec_id", "v")
    val plan = Pq.binaryTopK(vs.filter(col("vec_id") < 2), vs, "vec_id", "v",
        k = 3, refine = 2).queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    // the candidate-generation join is the one whose output carries codes
    // but no double-array column
    val scanJoin = joins.find(_.output.map(_.name).contains("c_code"))
    assert(scanJoin.isDefined, plan.toString)
    val tpes = scanJoin.get.children.flatMap(_.output).map(_.dataType.sql)
    assert(!tpes.exists(_.contains("DOUBLE")), tpes.mkString(","))
  }
}
