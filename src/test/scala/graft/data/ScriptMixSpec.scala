package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Script counts + mixed-script flag ([[TextFunctions.scriptCounts]]):
 * exact per-class character counts and the confusable-combination flag. */
class ScriptMixSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String): (Long, Long, Long, Long, Long, Long) =
    Seq(text).toDF("t")
      .select(TextFunctions.scriptCounts(col("t")).as("c"))
      .select(col("c.n_latin"), col("c.n_cyrillic"), col("c.n_greek"),
        col("c.n_cjk"), col("c.n_digit"), col("c.n_chars"))
      .as[(Long, Long, Long, Long, Long, Long)].head()

  private def mixed(text: String): Boolean =
    Seq(text).toDF("t")
      .select(TextFunctions.mixedScript(
        TextFunctions.scriptCounts(col("t"))))
      .as[Boolean].head()

  test("per-class counts are exact") {
    assert(counts("ab бв 12 α 中!") ===
      ((2L, 2L, 1L, 1L, 2L, 13L)))
    assert(counts("") === ((0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("mixed flag fires on latin+cyrillic and latin+greek only") {
    assert(mixed("pаypаl")) // Cyrillic 'а' homoglyphs
    assert(mixed("cafε"))        // Greek epsilon
    assert(!mixed("plain ascii text"))
    assert(!mixed("только")) // pure Cyrillic
    assert(!mixed("123 456"))
  }
}
