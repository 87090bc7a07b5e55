package graft.source

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The `graft-tradelog` on-disk format — a block-framed binary event log
  * with a committed manifest, built so the DataSource V2 connector
  * ([[TradeLogProvider]]) can demonstrate the full source contract this
  * sandbox cannot exercise against Kafka (no spark-sql-kafka jar, no
  * egress — reference `main.py:77-87`): real offset-tracked micro-batch
  * reads, block-statistics skipping, column-pruned decoding, and an
  * exactly-once distributed write.
  *
  * Layout under a directory:
  *   - `part-<writerPartition>-<taskId>-<uuid>.gtl` — data files, a
  *     sequence of BLOCKS: `[int32 nRows][int32 payloadLen][payload]`.
  *   - `index.manifest` — the COMMIT POINT. Header line, then one CSV
  *     line per block: `file,offset,payloadLen,nRows,minTsUs,maxTsUs`,
  *     in (file, offset) order — the global block sequence streaming
  *     offsets index into. Written atomically (temp + rename) by the
  *     driver-side `BatchWrite.commit`; data files not listed here are
  *     invisible to readers, which is what makes speculative/retried
  *     writer tasks and aborted jobs harmless (each writer uses a
  *     unique filename and only successful tasks' commit messages reach
  *     the manifest).
  *
  * Row payload encoding (schema [[TradeLogFormat.schema]]):
  *   `[nullMask byte][event_id i64][ts_us i64][user_id i64][value f64]
  *    [etLen i16][event_type utf8][prLen i32][props utf8]`
  * Fixed-width fields are always present (zero when null — the mask
  * decides); var-length fields are present only when non-null. The
  * decoder materializes ONLY the pruned columns and skips the rest by
  * arithmetic (fixed) or length-prefix hop (var-length) — column pruning
  * that actually avoids decode work, the parquet ReadSchema idea at
  * byte-codec scale.
  *
  * Per-block `minTsUs/maxTsUs` (over non-null ts) are the skip
  * statistics: a pushed ts-range conjunction drops whole blocks at plan
  * time, so a time-slice query over a day-bucketed, ts-sorted log reads
  * only the frames it needs — parquet row-group pruning re-expressed for
  * this format (the write path sorts within partitions by ts, so block
  * ranges are tight; see [[TradeLogQueries]]).
  */
object TradeLogFormat {
  import org.apache.spark.sql.types._

  val ManifestName = "index.manifest"
  val ManifestHeader = "graft-tradelog v1"
  val DefaultBlockRows = 1024

  /** Fixed reader/writer schema (events-table shaped, FIXTURES.md). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** One committed block: where it sits, its ts span, and (7th CSV field,
    * optional for manifests written before it existed) a hex-encoded
    * user_id bloom filter — the parquet column-bloom idea at block
    * granularity, so point lookups and runtime join filters skip blocks
    * whose bloom provably misses every requested id. */
  final case class BlockMeta(file: String, offset: Long, payloadLen: Int,
      nRows: Int, minTsUs: Long, maxTsUs: Long, bloomHex: String = "") {
    def csv: String =
      s"$file,$offset,$payloadLen,$nRows,$minTsUs,$maxTsUs,$bloomHex"
    def mightContainUser(id: Long): Boolean =
      TradeLogFormat.bloomMightContain(bloomHex, id)
  }

  object BlockMeta {
    def fromCsv(line: String): BlockMeta = {
      val a = line.split(",", -1)
      require(a.length == 6 || a.length == 7, s"bad manifest line: $line")
      BlockMeta(a(0), a(1).toLong, a(2).toInt, a(3).toInt,
        a(4).toLong, a(5).toLong, if (a.length == 7) a(6) else "")
    }
  }

  // ---- per-block user_id bloom ---------------------------------------
  // m = 8 bits per buffered row (m/n = 8, k = 3 → ~3% false positives at
  // a full block), double hashing from a splitmix64 mix — the same
  // fingerprint discipline as the dedup lanes: pure integer ops,
  // deterministic on any JVM/partitioning.

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Fresh bloom accumulator for a block of up to `blockRows` rows. */
  def bloomAlloc(blockRows: Int): Array[Long] =
    new Array[Long](math.max(1, blockRows / 8)) // 8*blockRows bits / 64

  /** Per-row write hot path: the k=3 double-hash positions are computed
    * in an unrolled loop — no Seq, no closure, zero allocation. */
  def bloomAdd(bits: Array[Long], id: Long): Unit = {
    val mBits = bits.length * 64
    val h1 = mix64(id)
    val h2 = mix64(id ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < 3) {
      val p = (((h1 + i * h2) & Long.MaxValue) % mBits).toInt
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  def bloomHex(bits: Array[Long]): String =
    bits.map(w => f"$w%016x").mkString

  /** Conservative check: an absent bloom (legacy manifest line) reports
    * "might contain". An all-zero bloom (every user_id in the block was
    * null) correctly reports a miss for every id — null never equals.
    * Decodes only the 3 probed 16-char words, never the whole hex. */
  def bloomMightContain(hex: String, id: Long): Boolean =
    hex.isEmpty || {
      val mBits = hex.length * 4
      val h1 = mix64(id)
      val h2 = mix64(id ^ 0x5851f42d4c957f2dL) | 1L
      var i = 0
      var ok = true
      while (ok && i < 3) {
        val p = (((h1 + i * h2) & Long.MaxValue) % mBits).toInt
        val word = java.lang.Long.parseUnsignedLong(
          hex.substring((p >>> 6) * 16, (p >>> 6) * 16 + 16), 16)
        ok = (word & (1L << (p & 63))) != 0
        i += 1
      }
      ok
    }

  /** Written-schema contract, shared by the batch and streaming write
    * paths (one check, one claim). */
  def requireWriteSchema(s: StructType): Unit =
    require(s.fields.map(f => (f.name, f.dataType)).sameElements(
      schema.fields.map(f => (f.name, f.dataType))),
      s"graft-tradelog expects ${schema.simpleString}, got ${s.simpleString}")

  /** Driver-side Hadoop conf: the ACTIVE session's hadoopConfiguration
    * when one exists (so `spark.hadoop.*` — S3A credentials, a
    * fs.defaultFS override, kerberos settings — reach the connector,
    * exactly like every other artifact path in this repo), else the
    * classpath core-site/hdfs-site. Executor-side readers/writers never
    * call this: they receive the DRIVER's conf explicitly through
    * [[HadoopConfBox]] in their factory. */
  def driverConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(dir: String): (FileSystem, Path) = fs(dir, driverConf())

  def fs(dir: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(conf), p)
  }

  /** Read the committed manifest: the global block sequence. */
  def readManifest(dir: String): Seq[BlockMeta] = readManifestMeta(dir)._1

  /** Blocks + last committed streaming epoch (compat accessor). */
  def readManifestFull(dir: String): (Seq[BlockMeta], Option[Long]) = {
    val (b, e, _) = readManifestMeta(dir)
    (b, e)
  }

  /** Manifest blocks plus the last committed streaming (epoch, queryId)
    * stamp (both None for a batch-written log — the header carries
    * ` epoch=N qid=X` only when the streaming sink published it). */
  def readManifestMeta(dir: String)
      : (Seq[BlockMeta], Option[Long], Option[String]) = {
    val (filesystem, root) = fs(dir)
    val in = filesystem.open(new Path(root, ManifestName))
    try {
      val src = scala.io.Source.fromInputStream(in, "UTF-8")
      val lines = src.getLines().map(_.trim).filter(_.nonEmpty).toSeq
      val head = lines.headOption.getOrElse("")
      require(head == ManifestHeader || head.startsWith(ManifestHeader + " "),
        s"not a graft-tradelog dir: $dir")
      val epoch = "epoch=(\\d+)".r.findFirstMatchIn(head).map(_.group(1).toLong)
      val qid = "qid=(\\S+)".r.findFirstMatchIn(head).map(_.group(1))
      (lines.tail.map(BlockMeta.fromCsv), epoch, qid)
    } finally in.close()
  }

  /** Atomic manifest publish: temp file + OVERWRITE rename IS the commit
    * — FileContext's Rename.OVERWRITE replaces the old manifest in one
    * step, so there is never a window with no manifest on disk (a
    * delete-then-rename would leave a reader-visible gap, and a crash
    * inside it would orphan the whole log). The streaming sink stamps
    * (epoch, queryId) into the header so a replayed epoch commit (driver
    * restart between sink commit and checkpoint write) is detected and
    * dropped — scoped to the SAME query, so a fresh-checkpoint query
    * appending to an existing log is never mistaken for a replay. */
  def writeManifest(dir: String, blocks: Seq[BlockMeta],
      epoch: Option[Long] = None, qid: Option[String] = None): Unit = {
    val conf = driverConf()
    val (filesystem, root) = fs(dir, conf)
    val tmp = new Path(root,
      s".$ManifestName.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = filesystem.create(tmp, true)
    try {
      val head = ManifestHeader + epoch.map(e => s" epoch=$e").getOrElse("") +
        qid.map(q => s" qid=$q").getOrElse("")
      val body = (head +: blocks.map(_.csv)).mkString("\n")
      out.write(body.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    val target = filesystem.makeQualified(new Path(root, ManifestName))
    val qtmp = filesystem.makeQualified(tmp)
    org.apache.hadoop.fs.FileContext.getFileContext(target.toUri, conf)
      .rename(qtmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** RETENTION purge + vacuum — the metadata-only DELETE of every block
    * whose entire ts span predates `cutoffUs`, then GC of data files no
    * surviving block references. Blocks STRADDLING the cutoff (and
    * blocks with an unknown span — all-null ts stores maxTsUs =
    * Long.MaxValue) survive conservatively; a reader enforcing the
    * retention boundary applies the ts predicate, which the same span
    * metadata turns into block skips. Policy for null-ts rows inside a
    * TIMED block: the span covers non-null ts only, so they expire with
    * their block — the retention predicate excludes them regardless, and
    * the ts-sorted writer layout clusters nulls into their own leading
    * blocks (unknown span ⇒ kept) when they must be retained.
    * The manifest rewrite is the usual
    * atomic publish-then-GC (a crash after publish leaves harmless
    * orphans, never dangling references) and CARRIES the streaming
    * (epoch, qid) stamp forward. Returns (#blocks dropped, #files
    * deleted). 100 TB shape: retention is O(manifest) driver work plus
    * unlinks — no data is read or rewritten, the delete every
    * time-partitioned archive actually runs.
    *
    * Concurrent readers: a scan plans its block list against the
    * manifest it read at PLAN time, so a reader in flight across the
    * publish can still reference just-expired files. `vacuumGraceMs`
    * bounds that window the lakehouse way (publish, then delayed GC):
    * the delist journal records WHEN each file became unreferenced, and
    * [[vacuum]] unlinks a victim only once it has been delisted for the
    * grace — measured from the PURGE, not from the file's write time
    * (retention victims are by definition old files, so an mtime-based
    * grace would never engage; r15 review finding). The default 0 keeps
    * the single-writer / no-concurrent-reader bench shape (immediate
    * unlink).
    *
    * Returns (#blocks dropped by THIS purge, #files GC'd by the
    * piggybacked [[vacuum]] pass). The second element is vacuum's total
    * for this call — it can include victims of EARLIER purges whose grace
    * just expired and previously adopted orphans past their age floor, so
    * it may exceed (or undershoot, under a grace) this purge's own delist
    * set (r16 advice: the two counters measure different things by
    * design). */
  def purgeBefore(dir: String, cutoffUs: Long,
      vacuumGraceMs: Long = 0L): (Int, Int) = {
    val (blocks, epoch, qid) = readManifestMeta(dir)
    val keep = blocks.filter(_.maxTsUs >= cutoffUs)
    writeManifest(dir, keep, epoch, qid)
    val keptFiles = keep.map(_.file).toSet
    val dropped = blocks.map(_.file).distinct.filterNot(keptFiles)
    val now = System.currentTimeMillis()
    writeTrash(dir, readTrash(dir) ++
      dropped.map(f => TrashEntry(f, now, adopted = false)))
    (blocks.size - keep.size, vacuum(dir, vacuumGraceMs))
  }

  /** Delist journal: `(file, delistMillis, adopted)` rows for every data
    * file a manifest rewrite stopped referencing, published with the same
    * tmp+atomic-rename as the manifest. The journal — not file mtime —
    * is vacuum's GC authority: it both carries the correct grace origin
    * (delist time) and keeps vacuum's hands off files it has never been
    * told about, which is what protects an in-flight WRITER's
    * pre-manifest-commit part files from being swept as garbage (r15
    * review finding — the old "unlink anything unreferenced" rule could
    * brick a log by deleting data its writer was about to commit).
    * Adopted orphans (files vacuum found unreferenced but was never told
    * about) carry a trailing `,o` marker so their deletion eligibility
    * can honor [[OrphanMinAgeMs]] independently of the caller's grace.
    *
    * SINGLE MAINTENANCE WRITER assumption (the same contract as the
    * manifest's epoch read-modify-write): journal updates are
    * read-modify-write + atomic replace, so two CONCURRENT purge/vacuum
    * callers are last-writer-wins — a lost entry is re-adopted as an
    * orphan on the next vacuum pass (self-healing, delayed one adoption
    * cycle), but maintenance ops should be serialized by the caller. */
  private val TrashName = "_trash.graftlog"

  /** One journal row: the delisted file, when it was delisted, and
    * whether it entered via orphan ADOPTION rather than an explicit
    * manifest-rewrite delist. */
  final case class TrashEntry(file: String, delistMs: Long, adopted: Boolean) {
    def line: String = s"$file,$delistMs${if (adopted) ",o" else ""}"
  }

  private[source] def readTrash(dir: String): Seq[TrashEntry] = {
    val (filesystem, root) = fs(dir)
    val p = new Path(root, TrashName)
    if (!filesystem.exists(p)) return Seq.empty
    val in = filesystem.open(p)
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(_.nonEmpty).map { l0 =>
          val adopted = l0.endsWith(",o")
          val l = if (adopted) l0.dropRight(2) else l0
          val i = l.lastIndexOf(',')
          TrashEntry(l.substring(0, i), l.substring(i + 1).toLong, adopted)
        }.toSeq
    } finally in.close()
  }

  private def writeTrash(dir: String, entries: Seq[TrashEntry]): Unit = {
    val conf = driverConf()
    val (filesystem, root) = fs(dir, conf)
    val p = filesystem.makeQualified(new Path(root, TrashName))
    if (entries.isEmpty) { filesystem.delete(p, false); return }
    val tmp = filesystem.makeQualified(new Path(root,
      s".$TrashName.tmp-${java.util.UUID.randomUUID().toString.take(8)}"))
    val out = filesystem.create(tmp, true)
    try {
      out.write(entries.map(_.line)
        .mkString("\n").getBytes(StandardCharsets.UTF_8))
    } finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Default minimum age an ADOPTED orphan must reach before vacuum may
    * unlink it, independent of the caller's grace: with the bench-shaped
    * default grace of 0, two back-to-back vacuum calls would otherwise
    * adopt-then-delete an in-flight writer's uncommitted part file in
    * milliseconds — exactly the hazard the journal exists to remove (r16
    * advice). 5 minutes comfortably exceeds any sane manifest-commit
    * latency; callers that KNOW no writer is in flight (tests, the
    * strict single-writer bench) pass `orphanMinAgeMs = 0` explicitly. */
  val OrphanMinAgeMs: Long = 5L * 60 * 1000

  /** Deferred GC driven by the delist journal: unlink every journaled
    * file whose delist timestamp is at least `graceMs` old and that the
    * CURRENT manifest still does not reference (a re-committed file's
    * entry is dropped without an unlink). Unreferenced `*.gtl` files the
    * journal does NOT know (crash-orphaned writer part files, or victims
    * of a pre-journal purge) are ADOPTED into the journal now and become
    * deletable only by a LATER vacuum call once their adoption ages past
    * `max(graceMs, orphanMinAgeMs)` — so an in-flight writer always has
    * at least one full vacuum cycle PLUS the orphan age floor to commit
    * its manifest before its files are at risk, even under the default
    * grace of 0 (r16 advice). Returns the number of files ACTUALLY
    * deleted: a victim the filesystem refuses to delete stays journaled
    * for the next pass and is not counted; an entry whose file is already
    * gone is dropped silently. Journal updates are read-modify-write —
    * see the single-maintenance-writer note on the journal above. */
  def vacuum(dir: String, graceMs: Long = 0L,
      orphanMinAgeMs: Long = OrphanMinAgeMs): Int = {
    val (blocks, _, _) = readManifestMeta(dir)
    val ref = blocks.map(_.file).toSet
    val (filesystem, root) = fs(dir)
    val now = System.currentTimeMillis()
    val journal = readTrash(dir)
    val (due, pending) = journal.partition { e =>
      val floor = if (e.adopted) math.max(graceMs, orphanMinAgeMs) else graceMs
      e.delistMs <= now - floor
    }
    var deleted = 0
    // count only files this call really unlinked; a refused delete keeps
    // its journal entry alive for the next pass (r16 advice — the old
    // code counted attempts and dropped failures from the journal)
    val failed = due.filter { e =>
      if (ref(e.file)) false // re-committed: drop the entry, no unlink
      else {
        val q = new Path(root, e.file)
        if (!filesystem.exists(q)) false // already gone: drop silently
        else if (filesystem.delete(q, false)) { deleted += 1; false }
        else true // delete refused: retry on a later pass
      }
    }
    val known = journal.map(_.file).toSet
    val orphans = filesystem.listStatus(root).toSeq.collect {
      case st if st.isFile && st.getPath.getName.endsWith(".gtl") &&
        !ref(st.getPath.getName) && !known(st.getPath.getName) =>
        TrashEntry(st.getPath.getName, now, adopted = true)
    }
    writeTrash(dir, pending.filterNot(e => ref(e.file)) ++ failed ++ orphans)
    deleted
  }

  // ---- row codec ------------------------------------------------------

  /** Encode one row (values in [[schema]] field order; null allowed) into
    * `out`. Returns the row's ts micros, or Long.MinValue when ts null. */
  def encodeRow(out: DataOutputStream, eventId: java.lang.Long,
      tsUs: java.lang.Long, userId: java.lang.Long, eventType: String,
      value: java.lang.Double, props: String): Long = {
    var mask = 0
    if (eventId == null) mask |= 1
    if (tsUs == null) mask |= 2
    if (userId == null) mask |= 4
    if (eventType == null) mask |= 8
    if (value == null) mask |= 16
    if (props == null) mask |= 32
    out.writeByte(mask)
    out.writeLong(if (eventId == null) 0L else eventId)
    out.writeLong(if (tsUs == null) 0L else tsUs)
    out.writeLong(if (userId == null) 0L else userId)
    out.writeDouble(if (value == null) 0.0 else value)
    if (eventType != null) {
      val b = eventType.getBytes(StandardCharsets.UTF_8)
      require(b.length <= Short.MaxValue, "event_type too long")
      out.writeShort(b.length); out.write(b)
    }
    if (props != null) {
      val b = props.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    if (tsUs == null) Long.MinValue else tsUs
  }

  /** Decode a block payload, materializing only the columns whose
    * [[schema]] ordinals appear in `wanted` (sorted). Calls `emit` with
    * the per-ordinal values (UTF8String for strings, boxed primitives,
    * null for nulls) laid out in `wanted` order. */
  def decodeBlock(payload: Array[Byte], nRows: Int, wanted: Array[Int])(
      emit: Array[Any] => Unit): Unit = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(payload))
    val want = new Array[Boolean](6)
    // ordinal -> output slot (decode order is the BYTE layout — value
    // before event_type — so slots map by ordinal, never arrival order)
    val slotOf = new Array[Int](6)
    wanted.zipWithIndex.foreach { case (ord, i) =>
      want(ord) = true; slotOf(ord) = i
    }
    var r = 0
    while (r < nRows) {
      val row = new Array[Any](wanted.length)
      def put(ord: Int, v: Any): Unit =
        if (want(ord)) row(slotOf(ord)) = v
      val mask = in.readUnsignedByte()
      val eid = in.readLong(); put(0, if ((mask & 1) != 0) null else eid)
      val ts = in.readLong(); put(1, if ((mask & 2) != 0) null else ts)
      val uid = in.readLong(); put(2, if ((mask & 4) != 0) null else uid)
      val v = in.readDouble(); put(4, if ((mask & 16) != 0) null else v)
      if ((mask & 8) == 0) {
        val n = in.readUnsignedShort()
        if (want(3)) {
          val b = new Array[Byte](n); in.readFully(b)
          put(3, org.apache.spark.unsafe.types.UTF8String.fromBytes(b))
        } else in.skipBytes(n)
      } else put(3, null)
      if ((mask & 32) == 0) {
        val n = in.readInt()
        if (want(5)) {
          val b = new Array[Byte](n); in.readFully(b)
          put(5, org.apache.spark.unsafe.types.UTF8String.fromBytes(b))
        } else in.skipBytes(n)
      } else put(5, null)
      emit(row)
      r += 1
    }
  }
}

/** Java-serializable Hadoop Configuration carrier: factories capture the
  * DRIVER's resolved conf at plan time and ship it to executor-side
  * readers/writers, so `spark.hadoop.*` settings apply on every task (a
  * fresh `new Configuration()` on an executor would see only classpath
  * XML). Built once per factory, not per task. */
final class HadoopConfBox(@transient private var c: org.apache.hadoop.conf.Configuration)
    extends java.io.Serializable {
  def conf: org.apache.hadoop.conf.Configuration = c
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    c.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    c = new org.apache.hadoop.conf.Configuration(false)
    c.readFields(in)
  }
}

object HadoopConfBox {
  /** Capture the driver's conf (call at plan/factory-creation time). */
  def active(): HadoopConfBox = new HadoopConfBox(TradeLogFormat.driverConf())
}
