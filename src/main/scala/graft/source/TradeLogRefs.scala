package graft.source

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path

import TradeLogFormat.{BlockMeta, CommitSpec, ManifestInfo}

/** NAMED REFS over the tradelog's generation ledger — branches and tags
  * (Iceberg refs / the write-audit-publish staging pattern, VERDICT r18
  * order sheet #7):
  *
  *   - A **tag** is an immutable name for a committed MAIN generation
  *     (`createTag`): release pins, audit anchors. Reading
  *     `option("ref", name)` serves exactly that generation's snapshot.
  *   - A **branch** is a named WRITABLE lineage forked from a main
  *     generation (`createBranch`): writes with
  *     `option("branch", name)` commit to the branch head — real
  *     distributed appends, claimed and sequenced under the same
  *     optimistic discipline as main commits — while the MAIN table is
  *     untouched. Audit by reading the ref; then `publish` FAST-FORWARDS
  *     main to the branch head as one re-referencing commit (RESTORE's
  *     trick: the branch's immutable shard files are adopted by
  *     reference, nothing is rewritten). Publish is conflict-checked:
  *     if main advanced past the fork point the fast-forward fails
  *     loudly — the WAP contract (re-stage against the new head).
  *
  * Storage: `_refs/<name>` is one atomic header line
  * (`graft-tradelog ref kind=… base=… gen=…`); branch commit `k` claims
  * `_manifests/gen-<k>-<name>.manifest` with a no-overwrite rename —
  * NAMESPACED from main's `gen-<N>.manifest` claims, so a branch never
  * contends with (or blocks) main's generation sequence. GC safety: ref'd
  * snapshots' data files join vacuum's referenced set and ref-anchored
  * main generations are excluded from snapshot expiry, so a staged
  * branch survives routine maintenance until it is dropped or published.
  *
  * 100 TB shape: a branch commit is the same O(touched day shards)
  * metadata work as a main commit; publish is O(branch shard refs) — no
  * data moves at any step, the Iceberg branch property. */
object TradeLogRefs {

  val RefsDirName = "_refs"
  private val RefHeader = "graft-tradelog ref"

  /** One named ref: `base` is the MAIN generation it forked from /
    * points at; `gen` is the branch-local commit count (0 = still at the
    * fork point; tags are always 0). */
  final case class RefInfo(name: String, kind: String, base: Long,
      gen: Long) {
    def isBranch: Boolean = kind == "branch"
    private[source] def line: String =
      s"$RefHeader kind=$kind base=$base gen=$gen"
    /** The snapshot file this ref's head resolves to. */
    private[source] def headManifestName: String =
      if (gen == 0L) s"${TradeLogFormat.ManifestDirName}/gen-$base.manifest"
      else s"${TradeLogFormat.ManifestDirName}/gen-$gen-$name.manifest"
  }

  private def requireRefName(name: String): Unit =
    require(name.matches("[A-Za-z0-9][A-Za-z0-9_.-]*"),
      s"graft-tradelog ref names are [A-Za-z0-9][A-Za-z0-9_.-]*: '$name'")

  private def refPath(root: Path, name: String): Path =
    new Path(root, s"$RefsDirName/$name")

  /** In-process serialization of ref-file read-modify-writes, keyed by
    * (log root, ref name) — cross-process racers arbitrate on the branch
    * snapshot CLAIM (no-overwrite rename), like main commits. */
  private val refLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(root: Path, name: String): Object =
    refLocks.computeIfAbsent(s"$root#$name", _ => new Object)

  /** Create a branch at the CURRENT main head generation. Fails if the
    * name exists (refs are created once, retargeted never — drop and
    * recreate to re-fork). Returns the ref. */
  def createBranch(dir: String, name: String): RefInfo = {
    requireRefName(name)
    val base = TradeLogFormat.readManifestHeader(dir).gen
    writeNewRef(dir, RefInfo(name, "branch", base, 0L))
  }

  /** Tag a committed main generation (head by default). Immutable. */
  def createTag(dir: String, name: String,
      gen: Option[Long] = None): RefInfo = {
    requireRefName(name)
    val headGen = TradeLogFormat.readManifestHeader(dir).gen
    val g = gen.getOrElse(headGen)
    require(g <= headGen,
      s"graft-tradelog $dir: generation $g is not committed (head is " +
        s"$headGen) — a tag cannot anchor an in-flight claim")
    // the snapshot must still exist (not expired)
    TradeLogFormat.readManifestInfoAt(dir, g, headerOnly = true)
    val ref = writeNewRef(dir, RefInfo(name, "tag", g, 0L))
    // …and must STILL exist after the ref is visible: expireSnapshots
    // reads the anchor set before its deletes, so a tag racing an
    // in-flight expiry can slip between that read and the unlink and
    // anchor a victimized generation (r19 advice, low). Re-validate
    // after publishing — the expiry re-reads anchors per unlink, so once
    // this check passes the tag is in every later read's anchor set —
    // and drop the dangling ref loudly if the snapshot is gone.
    try TradeLogFormat.readManifestInfoAt(dir, g, headerOnly = true)
    catch {
      case e: Exception =>
        dropRef(dir, name)
        throw new IllegalStateException(
          s"graft-tradelog $dir: generation $g was expired while tag " +
            s"'$name' was being created — the tag was dropped; re-create " +
            "it against a surviving snapshot", e)
    }
    ref
  }

  private def writeNewRef(dir: String, ref: RefInfo): RefInfo = {
    val conf = TradeLogFormat.driverConf()
    val (fs, root) = TradeLogFormat.fs(dir, conf)
    fs.mkdirs(new Path(root, RefsDirName))
    val ok = TradeLogFormat.publishAtomic(fs, conf,
      new Path(root, RefsDirName), refPath(root, ref.name),
      ref.line.getBytes(StandardCharsets.UTF_8), overwrite = false)
    require(ok, s"graft-tradelog $dir: ref '${ref.name}' already exists")
    ref
  }

  def readRef(dir: String, name: String): RefInfo = {
    val (fs, root) = TradeLogFormat.fs(dir)
    val p = refPath(root, name)
    require(fs.exists(p), s"graft-tradelog $dir has no ref '$name'")
    val in = fs.open(p)
    val head =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .find(_.nonEmpty).getOrElse("")
      finally in.close()
    require(head.startsWith(RefHeader), s"not a graft-tradelog ref: $name")
    def tok(k: String): String =
      s"$k=(\\S+)".r.findFirstMatchIn(head).map(_.group(1)).getOrElse(
        throw new IllegalStateException(s"ref '$name' is missing $k="))
    RefInfo(name, tok("kind"), tok("base").toLong, tok("gen").toLong)
  }

  def listRefs(dir: String): Seq[RefInfo] = {
    val (fs, root) = TradeLogFormat.fs(dir)
    val d = new Path(root, RefsDirName)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.filter(_.isFile)
      .map(st => readRef(dir, st.getPath.getName))
  }

  /** Drop a ref; a branch's own snapshot files go with it (their data
    * files become orphans for vacuum's age-gated adoption — the staged
    * write is garbage once unreachable). Returns true if it existed. */
  def dropRef(dir: String, name: String): Boolean = {
    val (fs, root) = TradeLogFormat.fs(dir)
    val p = refPath(root, name)
    if (!fs.exists(p)) return false
    val ref = readRef(dir, name)
    val existed = fs.delete(p, false)
    if (ref.isBranch) {
      val mdir = new Path(root, TradeLogFormat.ManifestDirName)
      val re = s"^gen-(\\d+)-${java.util.regex.Pattern.quote(name)}\\.manifest$$".r
      if (fs.exists(mdir)) fs.listStatus(mdir).foreach { st =>
        if (re.findFirstIn(st.getPath.getName).isDefined)
          fs.delete(st.getPath, false)
      }
    }
    existed
  }

  /** The committed state a ref's HEAD names (a branch's own latest
    * commit, or the anchored main generation for tags / unwritten
    * branches). */
  def headInfo(dir: String, name: String, headerOnly: Boolean = false,
      refsOnly: Boolean = false): ManifestInfo =
    headInfoOf(dir, readRef(dir, name), headerOnly, refsOnly)

  private def headInfoOf(dir: String, ref: RefInfo, headerOnly: Boolean,
      refsOnly: Boolean): ManifestInfo =
    TradeLogFormat.readManifestFile(dir, ref.headManifestName,
      headerOnly, refsOnly)

  /** Read a SPECIFIC branch snapshot (exact pin — what a scan resolved
    * once at schema inference reads at plan time). */
  def snapshotInfo(dir: String, name: String, gen: Long,
      headerOnly: Boolean = false, refsOnly: Boolean = false): ManifestInfo =
    headInfoOf(dir, RefInfo(name, "branch", 0L, gen), headerOnly, refsOnly)

  /** OPTIMISTIC commit to a branch head — the main protocol re-targeted:
    * read the ref, build the next branch-local generation's shard set,
    * claim `gen-<k+1>-<name>.manifest` (no-overwrite), publish the ref.
    * Exactly one claimant per branch generation wins; losers re-read and
    * retry; a dead claim is taken over after `claimPatienceMs`. `update`
    * sees the branch head as refs and returns the next state (or None to
    * abort). Returns the committed branch-local generation. */
  def commitToBranch(dir: String, name: String, maxAttempts: Int = 12,
      claimPatienceMs: Long = 60000L)(
      update: ManifestInfo => Option[CommitSpec]): Option[Long] = {
    val conf = TradeLogFormat.driverConf()
    val (fs, root) = TradeLogFormat.fs(dir, conf)
    val mdir = new Path(root, TradeLogFormat.ManifestDirName)
    val lock = lockFor(fs.makeQualified(root), name)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val ref = readRef(dir, name)
      require(ref.isBranch,
        s"graft-tradelog $dir: ref '$name' is a tag — tags are immutable")
      val attemptShards = scala.collection.mutable.ArrayBuffer.empty[String]
      def newShard(blocks: Seq[BlockMeta]): TradeLogFormat.ShardRef = {
        val sname = "shard-" + java.util.UUID.randomUUID().toString
          .replace("-", "").take(16) + ".csv"
        TradeLogFormat.publishAtomic(fs, conf, mdir, new Path(mdir, sname),
          blocks.map(_.csv).mkString("\n").getBytes(StandardCharsets.UTF_8),
          overwrite = true)
        attemptShards += sname
        TradeLogFormat.ShardRef.of(sname, blocks)
      }
      // branch head as refs; a legacy FLAT base migrates into day shards
      // exactly like a main commit would
      val prev0 = headInfoOf(dir, ref, headerOnly = false, refsOnly = true)
      val prev =
        if (prev0.shards.isEmpty && prev0.blocks.nonEmpty) {
          val seqd = TradeLogFormat.normalizeSeq(prev0.blocks)
          prev0.copy(shards = TradeLogFormat.groupByDay(seqd).map(newShard),
            maxSeq = seqd.map(_.seq).max)
        } else prev0
      update(prev) match {
        case None =>
          attemptShards.foreach(f => fs.delete(new Path(mdir, f), false))
          return None
        case Some(spec) =>
          val bgen = ref.gen + 1
          val baseSeq = math.max(prev.maxSeq,
            prev.shards.foldLeft(-1L)((a, r) => math.max(a, r.maxSeq))) + 1L
          val freshSeqd = spec.fresh.zipWithIndex.map { case (b, i) =>
            b.copy(seq = baseSeq + i) }
          val newRefs = (spec.rewrite.filter(_.nonEmpty) ++
            TradeLogFormat.groupByDay(freshSeqd)).map(newShard)
          val refs = spec.reuse ++ newRefs
          val maxSeq = math.max(baseSeq + freshSeqd.size - 1,
            refs.foldLeft(-1L)((a, r) => math.max(a, r.maxSeq)))
          val head = TradeLogFormat.ManifestHeader + s" gen=$bgen" +
            spec.epoch.map(e => s" epoch=$e").getOrElse("") +
            spec.qid.map(q => s" qid=$q").getOrElse("") +
            TradeLogFormat.xcolsToken(spec.xcols) +
            s" maxSeq=$maxSeq" +
            spec.delMode.orElse(prev.delMode)
              .map(m => s" delmode=$m").getOrElse("")
          val body = (head +: refs.map(_.line)).mkString("\n")
            .getBytes(StandardCharsets.UTF_8)
          val claim = new Path(mdir, s"gen-$bgen-$name.manifest")
          val won = lock.synchronized {
            TradeLogFormat.publishAtomic(fs, conf, mdir, claim, body,
              overwrite = false) &&
            // re-verify the claim still holds OUR body before the ref
            // publish: the patience-based takeover below deletes a
            // stalled claim and re-claims the same path, and a claimant
            // slow between its claim and its publish (GC pause, FS
            // stall) is indistinguishable from a dead one — publishing
            // blindly would point the ref at the other racer's manifest
            // or at a deleted file (r19 advice, low). A taken-over
            // claimant loses LOUDLY here and retries instead.
            claimHoldsBody(fs, claim, body) && {
              TradeLogFormat.publishAtomic(fs, conf,
                new Path(root, RefsDirName), refPath(root, name),
                RefInfo(name, "branch", ref.base, bgen).line
                  .getBytes(StandardCharsets.UTF_8), overwrite = true)
              true
            }
          }
          if (won) return Some(bgen)
          attemptShards.foreach(f => fs.delete(new Path(mdir, f), false))
          // lost the branch-generation race: wait for the winner's ref
          // publish, or take over a dead claim (the main protocol's rule)
          var spins = 0
          var waiting = true
          while (waiting && spins < 50) {
            if (readRef(dir, name).gen >= bgen) waiting = false
            else {
              val st =
                try Some(fs.getFileStatus(claim))
                catch { case _: java.io.FileNotFoundException => None }
              st match {
                case None => waiting = false // claim vanished: re-claim
                case Some(s) if System.currentTimeMillis() -
                    s.getModificationTime > claimPatienceMs =>
                  // dead claimant — but re-read the ref at the last
                  // instant: if the claim's owner published while this
                  // racer was deciding, deleting would unlink a LIVE
                  // branch head (the same check-then-act shape as the
                  // takeover race this path exists to resolve)
                  if (readRef(dir, name).gen >= bgen) waiting = false
                  else { fs.delete(claim, false); waiting = false }
                case _ => Thread.sleep(50); spins += 1
              }
            }
          }
      }
    }
    throw new IllegalStateException(
      s"graft-tradelog branch commit to $dir@$name lost $maxAttempts races")
  }

  /** Does the claim file exist and hold exactly `body`? False on any
    * read failure — the caller treats that as a lost race. */
  private[source] def claimHoldsBody(fs: org.apache.hadoop.fs.FileSystem,
      claim: Path, body: Array[Byte]): Boolean =
    try {
      val in = fs.open(claim)
      try {
        val buf = new java.io.ByteArrayOutputStream(body.length + 64)
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        java.util.Arrays.equals(buf.toByteArray, body)
      } finally in.close()
    } catch { case _: java.io.IOException => false }

  /** FAST-FORWARD PUBLISH — the WAP "publish" verb: main adopts the
    * branch head as ONE re-referencing commit (nothing rewritten — the
    * branch's immutable shard files join the main manifest, RESTORE's
    * trick). Conflict-checked inside every optimistic retry: main must
    * still be at the branch's fork generation, else the fast-forward is
    * impossible and the publish fails loudly (re-stage against the new
    * head — the WAP contract). The main head's streaming (epoch, qid)
    * replay stamp carries forward. Returns the new MAIN generation. */
  def publish(dir: String, name: String): Long = {
    val ref = readRef(dir, name)
    require(ref.isBranch,
      s"graft-tradelog $dir: ref '$name' is a tag — only branches publish")
    if (ref.gen == 0L) // nothing staged: main already holds the content
      return TradeLogFormat.readManifestHeader(dir).gen
    val bh = headInfoOf(dir, ref, headerOnly = false, refsOnly = true)
    val committed = TradeLogFormat.commitManifest(dir) { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalStateException(
        s"graft-tradelog $dir lost its manifest during a branch publish"))
      if (prev.gen != ref.base) throw new IllegalStateException(
        s"graft-tradelog $dir: branch '$name' forked at generation " +
          s"${ref.base} but main is at ${prev.gen} — the fast-forward " +
          "publish is not possible; re-stage the branch against the " +
          "current head")
      if (bh.shards.nonEmpty)
        Some(CommitSpec(reuse = bh.shards,
          epoch = prev.epoch, qid = prev.qid, xcols = bh.xcols))
      else
        Some(CommitSpec(
          rewrite = Seq(TradeLogFormat.normalizeSeq(bh.blocks)),
          epoch = prev.epoch, qid = prev.qid, xcols = bh.xcols))
    }
    committed.getOrElse(throw new IllegalStateException(
      s"graft-tradelog $dir: branch publish aborted unexpectedly"))
  }

  /** Data files referenced by any ref's head snapshot — vacuum's
    * protection set (a staged branch's files are reachable, not
    * orphans; a tagged old generation's files outlive the grace). */
  private[source] def referencedFiles(dir: String): Set[String] =
    listRefs(dir).flatMap { r =>
      TradeLogFormat.resolveBlocks(dir,
        headInfoOf(dir, r, headerOnly = false, refsOnly = true))
        .map(_.file)
    }.toSet

  /** Shard files referenced by any ref's head snapshot — the snapshot
    * sweep's protection set. */
  private[source] def referencedShards(dir: String): Set[String] =
    listRefs(dir).flatMap(r =>
      headInfoOf(dir, r, headerOnly = false, refsOnly = true)
        .shards.map(_.file)).toSet

  /** Main generations anchored by a ref (tag targets, branch fork
    * points) — excluded from snapshot expiry. */
  private[source] def anchoredGens(dir: String): Set[Long] =
    listRefs(dir).map(_.base).toSet
}
