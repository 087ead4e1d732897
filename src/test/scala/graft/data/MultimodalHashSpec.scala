package graft.data

import graft.SparkSpec
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Perceptual image hashing ([[Multimodal.dHashes]] / [[Multimodal
 * .imageNearDups]]) and the generic [[Dedup.hammingPairs]] kernel:
 * brightness invariance (the reason dHash exists), identical-image and
 * corrupt-payload behavior, and brute-force parity of the pigeonhole
 * join on arbitrary hashes.
 */
class MultimodalHashSpec extends SparkSpec {
  import spark.implicits._
  private implicit val sp: SparkSession = spark

  private def png(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) {
      val l = math.min(255, math.max(0, f(x, y)))
      img.setRGB(x, y, (l << 16) | (l << 8) | l)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hashOf(bytes: Array[Byte]): (Boolean, Long) = {
    val r = Multimodal.dHashes(
      Seq(Multimodal.MediaRow(1L, "img/png", bytes)).toDS()).collect().head
    (r.decoded, r.dhash)
  }

  test("dHash is invariant to uniform brightness shift") {
    val base = hashOf(png((x, y) => 20 + x * 9 + y * 3))
    val brighter = hashOf(png((x, y) => 60 + x * 9 + y * 3))
    assert(base._1 && brighter._1)
    assert(base._2 === brighter._2)
  }

  test("a local spike moves the hash only a few bits; reversal moves many") {
    val a = hashOf(png((x, y) => 20 + x * 9 + y * 3))._2
    val spiked = hashOf(png((x, y) =>
      if (x == 7 && y == 7) 200 else 20 + x * 9 + y * 3))._2
    val reversed = hashOf(png((x, y) => 200 - x * 9 - y * 3))._2
    def ham(p: Long, q: Long) = java.lang.Long.bitCount(p ^ q)
    assert(ham(a, spiked) > 0 && ham(a, spiked) <= 6, s"${ham(a, spiked)}")
    assert(ham(a, reversed) > 30, s"${ham(a, reversed)}")
  }

  test("imageNearDups: identical images pair at hamming 0; corrupt rows excluded") {
    val good = png((x, y) => 20 + x * 9)
    val media = Seq(
      Multimodal.MediaRow(1L, "img/png", good),
      Multimodal.MediaRow(2L, "img/png", good),
      Multimodal.MediaRow(3L, "img/png", Array[Byte](1, 2, 3))).toDS()
    val pairs = Multimodal.imageNearDups(media, maxHamming = 2)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)]
      .collect().toList
    assert(pairs === List((1L, 2L, 0L)))
    val hashes = Multimodal.dHashes(media).collect()
    assert(hashes.count(!_.decoded) === 1)
  }

  test("hammingPairs equals brute force on random 64-bit hashes") {
    val rng = new scala.util.Random(23)
    // clustered hashes so the ball is non-trivially populated
    val centers = Array.fill(5)(rng.nextLong())
    val items = (1 to 80).map { i =>
      val c = centers(i % 5)
      var h = c
      for (_ <- 0 until rng.nextInt(5)) h ^= 1L << rng.nextInt(64)
      (i.toLong, h)
    }
    val brute = (for {
      (ia, ha) <- items; (ib, hb) <- items
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 4
    } yield (ia, ib)).toSet
    val got = Dedup.hammingPairs(items.toDF("id", "h"), "id", "h",
        bits = 64, maxHamming = 4)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(got.length === got.distinct.length, "pair emitted twice")
    assert(got.toSet === brute)
  }

  test("dhashEmbed: bit j -> component j sign, unit norm") {
    val h = java.lang.Long.parseLong("10110", 2) // bits 1,2,4 set
    val v = Seq(h).toDF("h").select(Multimodal.dhashEmbed($"h").as("v"))
      .as[Seq[Double]].head()
    assert(v.length === 64)
    for (j <- 0 until 64) {
      val expect = if (((h >>> j) & 1L) == 1L) 0.125 else -0.125
      assert(v(j) === expect, s"bit $j")
    }
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12, "unit norm")
  }

  test("pairScores: scalar cosine parity, corrupt payload gated not fatal") {
    val ids = (0L until 6L)
    val media = ids.toDF("id").as[Long].map { id =>
      val p = Multimodal.syntheticPng(id)
      Multimodal.MediaRow(id, "img/png", if (id == 3L) p.take(10) else p)
    }
    val caps = ids.map(id => (id, s"caption words for image $id item${id % 3}"))
      .toDF("id", "caption")
    val got = Multimodal.pairScores(caps, media, "id", "caption",
        minScore = -1.0)
      .select($"media_id", $"decoded", $"score", $"kept")
      .as[(Long, Boolean, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === ids.toSet)
    assert(got(3L) === ((3L, false, 0.0, false)), "corrupt row gated")
    // scalar reference for one good row: dHash bits vs caption hashEmbed
    val (dec, dh) = hashOf(Multimodal.syntheticPng(2L))
    assert(dec)
    val iv = (0 until 64).map(j => if (((dh >>> j) & 1L) == 1L) 0.125 else -0.125)
    val cv = Seq("caption words for image 2 item2").toDF("t")
      .select(Similarity.hashEmbed(Similarity.tokenHashes($"t"), 64).as("v"))
      .as[Seq[Double]].head()
    val dot = iv.zip(cv).map { case (a, b) => a * b }.sum
    val ref = dot / (math.sqrt(iv.map(x => x * x).sum) *
      math.sqrt(cv.map(x => x * x).sum))
    assert(math.abs(got(2L)._3 - ref) < 1e-9, s"got ${got(2L)._3} ref $ref")
    // kept must track decoded && score >= threshold for every row
    got.values.foreach { case (id, dec2, sc, kept) =>
      assert(kept === (dec2 && sc >= -1.0), s"id=$id")
    }
  }

  test("pairScores: null/degenerate captions score 0.0, kept is always a real boolean") {
    // a NULL caption makes cosine null (kept would go null and crash
    // downstream filters); a zero-cancelling caption embedding makes it
    // 0/0 = NaN, which Spark orders ABOVE every double — both must pin
    // to score 0.0, kept=false, never null/NaN
    val media = Seq(0L, 1L, 2L).toDF("id").as[Long]
      .map(id => Multimodal.MediaRow(id, "img/png", Multimodal.syntheticPng(id)))
    val caps = Seq((0L, null.asInstanceOf[String]), (1L, "   "),
      (2L, "ordinary caption words")).toDF("id", "caption")
    val got = Multimodal.pairScores(caps, media, "id", "caption",
        minScore = 0.05)
      .select($"media_id", $"decoded", $"score", $"kept")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.isNullAt(2), r.getDouble(2), r.isNullAt(3),
          r.getBoolean(3)))).toMap
    got.foreach { case (id, (dec, scNull, sc, keptNull, kept)) =>
      assert(dec, s"id=$id decodes")
      assert(!scNull && !sc.isNaN, s"id=$id score=$sc")
      assert(!keptNull, s"id=$id kept must be a real boolean")
      assert(kept == (sc >= 0.05), s"id=$id gate consistency")
    }
    assert(got(0L)._3 == 0.0 && !got(0L)._5, "null caption: 0-score drop")
  }
}
