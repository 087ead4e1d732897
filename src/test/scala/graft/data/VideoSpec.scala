package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Video tier ([[Multimodal.syntheticVideo]] / [[Multimodal.videoNearDups]]):
 * the container round-trips frame-exact, corrupt payloads degrade to
 * empty, strides subsample, and the pair join equals a brute-force
 * frame-set Jaccard.
 */
class VideoSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark

  test("container round-trip: frames extract byte-identical") {
    val v = Multimodal.syntheticVideo(3L, nFrames = 5)
    val frames = Multimodal.extractFrames(v, stride = 1)
    assert(frames.size === 5)
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(java.util.Arrays.equals(f, Multimodal.syntheticPng(2 * 3L + i)))
    }
    assert(Multimodal.extractFrames(v, stride = 2).size === 3) // 0,2,4
  }

  test("malformed containers yield empty, not a crash") {
    assert(Multimodal.extractFrames(Array[Byte](1, 2, 3), 1) === Nil)
    assert(Multimodal.extractFrames("GVIDjunk".getBytes("US-ASCII"), 1) === Nil)
    val truncated = Multimodal.syntheticVideo(1L).take(30).toArray
    assert(Multimodal.extractFrames(truncated, 1) === Nil)
  }

  test("consecutive videos share 4 of 6 frame hashes (jaccard 0.5)") {
    val media = Seq(0L, 1L, 9L).map(id =>
      Multimodal.MediaRow(id, "video/gvid", Multimodal.syntheticVideo(id))).toDS()
    val got = Multimodal.videoNearDups(media, thresholdPpm = 1L)
      .select(col("id_a"), col("id_b"), col("jaccard_ppm"))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((0L, 1L)) === 500000L)
    assert(!got.contains((0L, 9L)) && !got.contains((1L, 9L)))
  }

  test("videoNearDups equals brute-force frame-set Jaccard") {
    val media = (0L until 12L).map(id =>
      Multimodal.MediaRow(id, "video/gvid", Multimodal.syntheticVideo(id))).toDS()
    val sigs = Multimodal.videoSignatures(media)
      .as[(Long, Seq[Long])].collect().toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      i = sigs(a).toSet.intersect(sigs(b).toSet).size.toLong
      u = sigs(a).size.toLong + sigs(b).size - i
      j = if (u > 0) i * 1000000L / u else 0L
      if j >= 300000L
    } yield (a, b, j)).toSet
    val got = Multimodal.videoNearDups(media, thresholdPpm = 300000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }
}
