package graft.data

import graft.SparkSpec

/**
 * The shared versioned-publish spelling: crash recovery (an orphaned
 * committed version above the pointer must not wedge the directory) and
 * orphan GC once the pointer passes it.
 */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def write(n: Long)(path: String): Unit =
    Seq(Tuple1(n)).toDF("x").write.parquet(path)

  test("publish recovers from a crash between rename-commit and pointer flip") {
    val dir = java.nio.file.Files.createTempDirectory("versioned").toString
    assert(Versioned.publish(spark, dir)(write(1)) === 1L)
    // simulate the crash: v2 fully committed on disk, pointer still at 1
    Seq(Tuple1(2L)).toDF("x").write.parquet(s"$dir/v2")
    assert(Versioned.latestVersion(spark, dir) === Some(1L))
    // the next publish skips the orphan instead of colliding forever
    assert(Versioned.publish(spark, dir)(write(3)) === 3L)
    assert(Versioned.latestVersion(spark, dir) === Some(3L))
    // readers were never exposed to the orphan; prune GCs it once the
    // pointer has passed it
    assert(Versioned.pruneVersions(spark, dir, keep = 0).toSet === Set(1L, 2L))
    assert(Versioned.latestVersion(spark, dir) === Some(3L))
  }
}
