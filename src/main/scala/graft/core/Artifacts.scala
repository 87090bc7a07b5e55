package graft.core

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Single-winner publication for build-once artifacts (merge tables,
  * persisted indexes, label stores): stage the whole build under a hidden
  * sibling temp dir, then atomically rename it into place — the TradeLog
  * manifest commit pattern lifted to directory artifacts. Readers never
  * observe a partial artifact (the directory appears in one rename), and
  * when two cold-path sessions race, `Rename.NONE` lets exactly one
  * publish; the loser discards its staging dir and reads the winner's —
  * a plain `_SUCCESS`-guarded in-place overwrite would instead let one
  * racer read the other's half-replaced files. */
object Artifacts {

  private def marked(fs: FileSystem, p: Path): Boolean =
    fs.exists(new Path(p, "_SUCCESS"))

  /** Build `path` if it is not already published (marked by `_SUCCESS`).
    * `build` receives a staging path and must leave a COMPLETE artifact
    * there, `_SUCCESS` included (Spark's parquet committer does).
    *
    * Crash leftovers vs concurrent winners: an unmarked directory at
    * `path` is normally a pre-atomic-writer crash leftover (staged builds
    * appear only via the rename) — BUT between observing it and deleting
    * it, a concurrent racer's rename can land a complete artifact, so a
    * blind delete could destroy a published artifact the racer is already
    * reading (r15 review finding). The loop below re-checks the marker
    * IMMEDIATELY before each delete (shrinking the window from
    * marker-check→delete across a whole call to one instruction gap),
    * defers to the winner after a lost rename only if the winner is
    * marked, retries (bounded) otherwise, and verifies the marker before
    * returning. A filesystem with no atomic delete-if-unmarked cannot
    * close the gap entirely; the residual worst case is a transient
    * re-build of a deterministic artifact, never a half-read one. */
  def publishOnce(s: SparkSession, path: String)(build: String => Unit): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    var attempts = 0
    while (!marked(fs, p) && attempts < 3) {
      attempts += 1
      if (fs.exists(p) && !marked(fs, p)) fs.delete(p, true)
      if (stageAndPublish(s, path)(build)) return
      // rename lost: somebody else owns the destination — if it is a
      // marked artifact they won fairly; if it is unmarked debris (their
      // crash between our delete and rename), loop and clear it again
    }
    if (!marked(fs, p))
      throw new IllegalStateException(
        s"publishOnce($path): destination still unmarked after $attempts " +
          "attempts — a writer is crash-looping or the path is not writable")
  }

  /** The stage→rename step, exists-check-free (so a spec can drive the
    * collision branch directly). Returns true if this call published,
    * false if a concurrent winner beat it to the rename. The staging dir
    * is removed on EVERY exit path: rename success consumes it, a lost
    * race deletes it, and a failed `build` (job error, interrupt) cleans
    * it in the catch — failed cold builds must not accumulate hidden
    * `.name.staging-*` debris next to the artifact (r15 review finding). */
  private[graft] def stageAndPublish(s: SparkSession, path: String)(
      build: String => Unit): Boolean = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent,
      s".${p.getName}.staging-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      build(fs.makeQualified(tmp).toString)
      fs.mkdirs(p.getParent)
      val ctx = FileContext.getFileContext(fs.makeQualified(p).toUri, conf)
      try {
        ctx.rename(fs.makeQualified(tmp), fs.makeQualified(p),
          Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.nio.file.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.ParentNotDirectoryException =>
          fs.delete(tmp, true) // lost the race; check the winner upstream
          false
      }
    } catch {
      case e: Throwable =>
        fs.delete(tmp, true) // failed build: no staging debris
        throw e
    }
  }
}
