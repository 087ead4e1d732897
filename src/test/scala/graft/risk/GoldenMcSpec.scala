package graft.risk

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.{SparkEntry, SparkSpec}

/**
 * Golden-snapshot regression gate for the Monte-Carlo chain (q30–q35).
 *
 * These queries have no SQL oracle — a seeded multivariate-normal draw
 * cannot be reproduced cross-engine (SURVEY §7.5) — but the engine itself
 * is deterministic per seed, so the expected VALUES are pinned here as
 * committed CSV snapshots. Any drift in the RNG, the simulation, the
 * scoring expression, or the aggregation chain fails these tests; the
 * driver's rows-only check stays as-is.
 *
 * Doubles are rounded to 6 significant digits before comparison so the
 * snapshots are robust to partition-order float reassociation.
 *
 * Regenerate after an INTENTIONAL semantic change with:
 *   GOLDEN_REGEN=1 sbt "testOnly graft.risk.GoldenMcSpec"
 * and commit the diff (review it — it IS the behavior change).
 */
class GoldenMcSpec extends SparkSpec {

  private val goldenDir = new File("src/test/resources/golden")
  private val queries = Seq(
    "q27c_ann_ivf_kmeans", "q30_mc_portfolio_var", "q31_var_by_country",
    "q32_compliance", "q33_mc_trials", "q33b_mc_trials_stored",
    "q34_risk_contribution", "q35_compliance_daily", "q37_file_config",
    "q23b_minhash64", "q54_pca", "q54b_pca_ann", "q54c_pca_sampled", "q87_bpe_merges",
    "q91b_simhash_hamming64",
    "q112_unigram_train", "q115_sampled_encode",
    "q119_mmr_rerank", "q120_image_neardups", "q121_compression_signal",
    "q142_audio_features",
    "q158_video_neardups", "q162b_html_content",
    "q176_hilbert_layout", "q179_pair_filter")

  /** Canonical text form: columns sorted by name, one CSV line per row,
   * rows sorted lexicographically, doubles to 6 significant digits. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val lines = proj.collect().toSeq.map { row =>
      cols.indices.map { i =>
        row.get(i) match {
          case null => "null"
          case d: java.lang.Double =>
            if (d.isNaN || d.isInfinite) d.toString
            else if (d == 0.0) "0"
            else {
              val bd = new java.math.BigDecimal(d.doubleValue())
                .round(new java.math.MathContext(6))
              bd.toString
            }
          case f: java.lang.Float => canonDouble(f.toDouble)
          case other => other.toString
        }
      }.mkString(",")
    }
    (cols.mkString(",") +: lines.sorted)
  }

  private def canonDouble(d: Double): String =
    new java.math.BigDecimal(d).round(new java.math.MathContext(6)).toString

  /** The flagship `entry` is smoke-checked rows>0 by the driver — pin its
   * values too (it is the first thing anyone runs). */
  private def run(q: String): DataFrame =
    if (q == "entry") SparkEntry.entry(spark)
    else SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")

  ("entry" +: queries).foreach { q =>
    test(s"$q matches its golden snapshot") {
      val got = canon(run(q))
      val file = new File(goldenDir, s"$q.csv")
      if (sys.env.contains("GOLDEN_REGEN")) {
        goldenDir.mkdirs()
        Files.write(file.toPath, got.mkString("\n").getBytes(StandardCharsets.UTF_8))
        info(s"regenerated ${file.getPath} (${got.size - 1} rows)")
      } else {
        assert(file.exists(),
          s"golden snapshot missing — run GOLDEN_REGEN=1 sbt 'testOnly graft.risk.GoldenMcSpec'")
        val expected = new String(Files.readAllBytes(file.toPath), StandardCharsets.UTF_8)
          .split("\n").toSeq
        assert(got.size == expected.size,
          s"row count drift: got ${got.size - 1} rows, golden has ${expected.size - 1}")
        got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
          assert(g == e, s"line $i drifted:\n  got    $g\n  golden $e")
        }
      }
    }
  }
}
