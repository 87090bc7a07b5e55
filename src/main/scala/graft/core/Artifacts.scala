package graft.core

import org.apache.hadoop.fs.{FileContext, Options, Path}
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

  /** Build `path` if it is not already published (marked by `_SUCCESS`).
    * `build` receives a staging path and must leave a COMPLETE artifact
    * there, `_SUCCESS` included (Spark's parquet committer does). */
  def publishOnce(s: SparkSession, path: String)(build: String => Unit): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(p, "_SUCCESS"))) {
      // a directory without the marker is a pre-atomic-writer crash
      // leftover — it can never be a concurrent writer's output (staged
      // builds appear only via the rename), so clear it for the rename
      if (fs.exists(p)) fs.delete(p, true)
      stageAndPublish(s, path)(build)
    }
  }

  /** The stage→rename step, exists-check-free (so a spec can drive the
    * collision branch directly). Returns true if this call published,
    * false if a concurrent winner beat it to the rename. */
  private[graft] def stageAndPublish(s: SparkSession, path: String)(
      build: String => Unit): Boolean = {
    val conf = s.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val tmp = new Path(p.getParent,
      s".${p.getName}.staging-${java.util.UUID.randomUUID().toString.take(8)}")
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
        fs.delete(tmp, true) // lost the race; the winner's artifact is whole
        false
    }
  }
}
