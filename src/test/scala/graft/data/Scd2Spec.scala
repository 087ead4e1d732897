package graft.data

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * SCD-2 history build ([[Relational.scd2]]): no-op updates open no
 * version, intervals chain exactly, the last version is current, and
 * null attribute transitions follow IS DISTINCT FROM semantics.
 */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("versions chain: each valid_to equals the next valid_from") {
    val log = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "bronze"), (1L, 30L, "silver"),
      (1L, 40L, "gold"), (2L, 15L, "silver"), (2L, 25L, "silver"))
      .toDF("cust", "ts", "tier")
    val got = Relational.scd2(log, Seq("cust"), "ts", Seq("tier"))
      .select(col("cust"), col("valid_from"), col("valid_to"), col("tier"),
        col("is_current"))
      .as[(Long, Long, Option[Long], String, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toList
    assert(got === List(
      (1L, 10L, Some(30L), "bronze", false),
      (1L, 30L, Some(40L), "silver", false),
      (1L, 40L, None, "gold", true),
      (2L, 15L, None, "silver", true)))
  }

  test("multi-attribute change: any tracked column opens a version") {
    val log = Seq(
      (1L, 1L, "a", 10), (1L, 2L, "a", 20), (1L, 3L, "a", 20),
      (1L, 4L, "b", 20))
      .toDF("k", "ts", "s", "v")
    val got = Relational.scd2(log, Seq("k"), "ts", Seq("s", "v"))
      .select(col("valid_from")).as[Long].collect().sorted
    assert(got === Array(1L, 2L, 4L))
  }

  test("null transitions: null != value opens, null == null does not") {
    val log = Seq(
      (1L, 1L, Option("x")), (1L, 2L, Option.empty[String]),
      (1L, 3L, Option.empty[String]), (1L, 4L, Option("x")))
      .toDF("k", "ts", "s")
    val got = Relational.scd2(log, Seq("k"), "ts", Seq("s"))
      .select(col("valid_from")).as[Long].collect().sorted
    assert(got === Array(1L, 2L, 4L))
  }

  test("fingerprint delimiter: (ab, c) -> (a, bc) opens a version") {
    // a delimiter-free concat would see "abc" == "abc" and drop the
    // change; the control-char-delimited fingerprint must keep both
    val log = Seq(
      (1L, 1L, "ab", "c"), (1L, 2L, "a", "bc"),
      (2L, 1L, "a", "b"), (2L, 2L, "a", "b")) // identical: one version
      .toDF("k", "ts", "x", "y")
    val got = Relational.scd2(log, Seq("k"), "ts", Seq("x", "y"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("scd2Apply == full recompute on an append-only feed") {
    val full = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "b"), (1L, 40L, "c"),
      (2L, 15L, "x"), (2L, 45L, "y"), (3L, 50L, "q"))
      .toDF("k", "ts", "s")
    for (cut <- Seq(5L, 25L, 35L, 60L)) {
      val history = Relational.scd2(full.filter(col("ts") < cut),
        Seq("k"), "ts", Seq("s"))
      val got = Relational.scd2Apply(history, full.filter(col("ts") >= cut),
          Seq("k"), "ts", Seq("s"))
        .select(col("k"), col("valid_from"), col("valid_to"), col("s"),
          col("is_current"))
        .as[(Long, Long, Option[Long], String, Boolean)].collect().toSet
      val want = Relational.scd2(full, Seq("k"), "ts", Seq("s"))
        .select(col("k"), col("valid_from"), col("valid_to"), col("s"),
          col("is_current"))
        .as[(Long, Long, Option[Long], String, Boolean)].collect().toSet
      assert(got === want, s"cut=$cut")
    }
  }

  test("scd2Apply: a no-op change batch leaves the history unchanged") {
    val log = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "ts", "s")
    val history = Relational.scd2(log, Seq("k"), "ts", Seq("s"))
    val noop = Seq((1L, 30L, "b")).toDF("k", "ts", "s")
    val got = Relational.scd2Apply(history, noop, Seq("k"), "ts", Seq("s"))
      .select(col("valid_from"), col("valid_to"), col("is_current"))
      .as[(Long, Option[Long], Boolean)].collect().toSet
    assert(got === Set((10L, Some(20L), false), (20L, None, true)))
  }
}
