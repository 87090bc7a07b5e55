package graft.core

import graft.SparkTestBase
import org.apache.hadoop.fs.Path

/** Artifacts.publishOnce: the staged-rename build-once lifecycle. The
  * claims under test: a published artifact is never rebuilt, a crash
  * leftover (directory without _SUCCESS) is cleared and rebuilt, and the
  * collision branch (two cold-path racers) leaves exactly the winner's
  * artifact with no staging debris — the in-place-overwrite hazard the
  * helper exists to remove. */
class ArtifactsSpec extends SparkTestBase {
  import spark.implicits._

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeArtifact(tag: String)(staging: String): Unit =
    Seq((tag, 1L)).toDF("tag", "v").write.mode("overwrite").parquet(staging)

  test("publishOnce builds when absent, skips when published, rebuilds crash leftovers") {
    val root = java.nio.file.Files.createTempDirectory("graft-art").toString
    val path = s"$root/merges/v1"
    var builds = 0
    def build(staging: String): Unit = { builds += 1; writeArtifact("a")(staging) }
    Artifacts.publishOnce(spark, path)(build)
    assert(builds == 1 && fs(path).exists(new Path(path, "_SUCCESS")))
    assert(spark.read.parquet(path).collect().head.getString(0) == "a")
    // published → the build fn must not run again
    Artifacts.publishOnce(spark, path)(build)
    assert(builds == 1, "published artifact was rebuilt")
    // a directory WITHOUT the marker is a crash leftover: moved aside
    // (never deleted in place — a racer's rename could have landed a
    // complete artifact in the check→act gap), verified-unmarked, then
    // cleared and rebuilt — with no tombstone debris left behind
    fs(path).delete(new Path(path, "_SUCCESS"), false)
    Artifacts.publishOnce(spark, path)(build)
    assert(builds == 2 && spark.read.parquet(path).count() == 1)
    val debris = fs(root).listStatus(new Path(s"$root/merges"))
      .map(_.getPath.getName).filterNot(_ == "v1")
    assert(debris.isEmpty, s"tombstone/staging debris left: ${debris.toSeq}")
  }

  test("rename collision: the losing racer discards its staging dir, winner's artifact intact") {
    val root = java.nio.file.Files.createTempDirectory("graft-art2").toString
    val path = s"$root/merges/v1"
    assert(Artifacts.stageAndPublish(spark, path)(writeArtifact("winner")))
    // a second racer that already passed the exists-check builds and then
    // loses the rename — driven directly via the check-free entry point
    assert(!Artifacts.stageAndPublish(spark, path)(writeArtifact("loser")),
      "second publisher must lose the rename race")
    assert(spark.read.parquet(path).collect().head.getString(0) == "winner",
      "winner's artifact must be untouched by the losing racer")
    val leftover = fs(root).listStatus(new Path(s"$root/merges"))
      .map(_.getPath.getName).filterNot(_ == "v1")
    assert(leftover.isEmpty, s"staging debris left behind: ${leftover.toSeq}")
  }

  test("a failed build leaves no staging debris and no artifact") {
    val root = java.nio.file.Files.createTempDirectory("graft-art3").toString
    val path = s"$root/merges/v1"
    val boom = intercept[RuntimeException] {
      Artifacts.publishOnce(spark, path) { staging =>
        writeArtifact("partial")(staging) // half-done work, then the crash
        throw new RuntimeException("job failed mid-build")
      }
    }
    assert(boom.getMessage.contains("mid-build"))
    val parent = new Path(s"$root/merges")
    val names =
      if (fs(root).exists(parent))
        fs(root).listStatus(parent).map(_.getPath.getName).toSeq
      else Seq.empty
    assert(names.isEmpty,
      s"failed cold builds must not accumulate staging debris: $names")
    // and the next attempt builds cleanly
    Artifacts.publishOnce(spark, path)(writeArtifact("good"))
    assert(spark.read.parquet(path).collect().head.getString(0) == "good")
  }

  test("a racer landing between the marker check and the rebuild is respected, not destroyed") {
    // drives publishOnce's lost-rename branch: the destination is taken by
    // a COMPLETE (marked) artifact after this caller decided to build —
    // publishOnce must defer to the winner instead of deleting it
    val root = java.nio.file.Files.createTempDirectory("graft-art4").toString
    val path = s"$root/merges/v1"
    var winnerPlanted = false
    Artifacts.publishOnce(spark, path) { staging =>
      // simulate the concurrent winner completing while this build runs
      Artifacts.stageAndPublish(spark, path)(writeArtifact("winner"))
      winnerPlanted = true
      writeArtifact("latecomer")(staging)
    }
    assert(winnerPlanted)
    assert(spark.read.parquet(path).collect().head.getString(0) == "winner",
      "publishOnce must defer to a concurrently published artifact")
  }
}
