package graft.source

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkTestBase
import TradeLogFormat.{BlockMeta, CommitSpec}

/** Contract tests for the round-17 manifest machinery: the OPTIMISTIC
  * commit protocol (exactly one winner per generation, losers re-merge
  * and retry, dead claims taken over), the TWO-LEVEL manifest (per-day
  * shard files carried by ref, rewritten only when touched), and the
  * legacy flat-manifest migration path. */
class TradeLogCommitSpec extends SparkTestBase {

  private val Fmt = "graft-tradelog"

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-tlc-$tag").toString

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def df(rows: Seq[Row]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), TradeLogFormat.schema)

  private def canon(d: org.apache.spark.sql.DataFrame): Set[String] =
    d.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  /** A fabricated one-block append payload (manifest-level tests need no
    * real data files — readers resolve blocks only through the manifest). */
  private def fakeBlock(tag: String, dayUs: Long): BlockMeta =
    BlockMeta(s"part-$tag.gtl", 0L, 100, 10, dayUs, dayUs + 1000L)

  test("optimistic commit: two racing appenders, exactly one winner per generation, zero lost blocks") {
    val dir = tmpDir("race")
    val day = 1704067200000000L // 2024-01-01 UTC in epoch µs
    val perThread = 8
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        (0 until perThread).foreach { i =>
          val got = TradeLogFormat.commitManifest(dir) { prev =>
            Some(CommitSpec(
              reuse = prev.map(_.shards).getOrElse(Seq.empty),
              fresh = Seq(fakeBlock(s"t$t-$i", day + t * 1000000L))))
          }
          assert(got.nonEmpty, s"append t$t-$i aborted unexpectedly")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val info = TradeLogFormat.readManifestInfo(dir)
    // every commit took its own generation: head gen == total commits
    assert(info.gen == 2L * perThread,
      s"16 appends must land 16 generations, got ${info.gen}")
    // zero lost blocks: all 16 appended blocks present at head
    assert(info.blocks.size == 2 * perThread,
      s"lost blocks under contention: ${info.blocks.map(_.file)}")
    assert(info.blocks.map(_.file).distinct.size == 2 * perThread)
    // seqs are the commit order: dense, distinct, monotone
    assert(info.blocks.map(_.seq).sorted == (0L until 2L * perThread),
      s"block seqs must be dense commit order: ${info.blocks.map(_.seq)}")
    // every generation snapshot exists and is addressable (the claim IS
    // the snapshot); each pins a strictly growing block count
    val counts = (1L to info.gen).map(g =>
      TradeLogFormat.readManifestInfoAt(dir, g).blocks.size)
    assert(counts == (1 to 2 * perThread),
      s"generation snapshots must pin each commit state exactly: $counts")
  }

  test("a dead claimant's orphan snapshot is ignored by resolution/expiry and taken over by the next commit") {
    val dir = tmpDir("orphan")
    val day = 1704067200000000L
    // two committed epoch generations (the asOfEpoch anchors)
    TradeLogFormat.writeManifest(dir, Seq(fakeBlock("e1", day)),
      epoch = Some(1L), qid = Some("q"), epochCommit = true)
    TradeLogFormat.commitManifest(dir) { prev =>
      Some(CommitSpec(reuse = prev.get.shards,
        fresh = Seq(fakeBlock("e2", day + 1000000L)),
        epoch = Some(2L), qid = Some("q"), epochCommit = true))
    }
    val headGen = TradeLogFormat.readManifestHeader(dir).gen
    assert(headGen == 2)
    // plant a crashed commit's claim: gen 3 snapshot exists, head never
    // advanced — an uncommitted state carrying a tempting epoch stamp
    val (fs, root) = TradeLogFormat.fs(dir)
    val orphan = new org.apache.hadoop.fs.Path(root,
      s"${TradeLogFormat.ManifestDirName}/gen-3.manifest")
    locally {
      val o = fs.create(orphan, true)
      o.write((TradeLogFormat.ManifestHeader +
        " gen=3 epoch=99 qid=q ecommit=1 maxSeq=9\n" +
        fakeBlock("ghost", day).csv).getBytes("UTF-8"))
      o.close()
    }
    // ADVICE r16 (medium): the orphan must never resolve as a committed
    // epoch — asOfEpoch is bounded by the head generation
    assert(TradeLogFormat.resolveEpochGen(dir, 99L) == 2L,
      "an uncommitted claim's epoch stamp must not be resolvable")
    // ...and expiry must not let it displace the real head's snapshot
    assert(TradeLogFormat.expireSnapshots(dir, keepLast = 1) == 1,
      "expiry should count committed snapshots only (gen 1)")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root,
      s"${TradeLogFormat.ManifestDirName}/gen-2.manifest")),
      "the committed head generation's snapshot must always survive expiry")
    // the next commit finds gen 3 claimed by a dead writer: with the
    // patience elapsed it takes the claim over and wins gen 3 itself
    fs.setTimes(orphan, System.currentTimeMillis() - 10000L, -1)
    val won = TradeLogFormat.commitManifest(dir, claimPatienceMs = 1000L) {
      prev => Some(CommitSpec(reuse = prev.get.shards,
        fresh = Seq(fakeBlock("late", day + 2000000L))))
    }
    assert(won.contains(3L),
      s"takeover must reclaim the dead generation: $won")
    assert(TradeLogFormat.readManifestInfo(dir).blocks.size == 3)
    assert(TradeLogFormat.readManifestInfoAt(dir, 3L).blocks
      .forall(_.file != "part-ghost.gtl"),
      "the dead claim's content must be gone after takeover")
  }

  test("two-level manifest: appends rewrite only touched day shards; untouched refs carry by file identity") {
    val dir = tmpDir("reuse") + "/log"
    val d1 = (1L to 6L).map(i =>
      Row(i, ts(f"2024-01-01 00:00:${i}%02d"), i, "a", i.toDouble, "{}"))
    val d2 = (7L to 9L).map(i =>
      Row(i, ts(f"2024-01-02 00:00:${i}%02d"), i, "b", i.toDouble, "{}"))
    val d2more = (10L to 12L).map(i =>
      Row(i, ts(f"2024-01-02 01:00:${i}%02d"), i, "c", i.toDouble, "{}"))
    df(d1 ++ d2).coalesce(1).sortWithinPartitions("ts")
      .write.format(Fmt).mode("overwrite").option("blockRows", 3).save(dir)
    val refs1 = TradeLogFormat.readManifestRefs(dir).shards
    assert(refs1.size >= 2, s"two days should shard apart: $refs1")
    // append lands only in day 2: day 1's shard ref must carry over
    // byte-identical (same file name), and only new shards join
    df(d2more).coalesce(1).write.format(Fmt).mode("append")
      .option("blockRows", 3).save(dir)
    val refs2 = TradeLogFormat.readManifestRefs(dir).shards
    assert(refs1.forall(r => refs2.exists(_.file == r.file)),
      "an append must never rewrite untouched day shards")
    assert(refs2.size > refs1.size)
    // the shard tier prunes: a day-1 slice reads only day-1 shards
    val scan = spark.read.format(Fmt).load(dir)
      .filter(org.apache.spark.sql.functions.col("ts") <
        org.apache.spark.sql.functions.lit("2024-01-02 00:00:00")
          .cast("timestamp"))
      .queryExecution.sparkPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan
      }.collectFirst { case s: TradeLogScan => s }.get
    assert(scan.shardsRead < scan.shardsTotal && scan.shardsRead >= 1,
      s"day slice must skip shards: ${scan.shardsRead}/${scan.shardsTotal}")
    // and the generation snapshot SHARES shard files with the head (the
    // Iceberg manifest-list property: snapshots are refs, not copies)
    val snap1 = TradeLogFormat.readManifestInfoAt(dir, 1L, refsOnly = true)
    assert(snap1.shards.map(_.file).toSet.subsetOf(
      refs2.map(_.file).toSet),
      "generation snapshots must share unrewritten shard files")
    assert(canon(spark.read.format(Fmt).load(dir)) ==
      canon(df(d1 ++ d2 ++ d2more)))
  }

  test("legacy flat manifests read unchanged and migrate to shards on first commit") {
    val dir = tmpDir("flat") + "/log"
    val rows = (1L to 9L).map(i =>
      Row(i, ts(f"2024-01-0${(i % 3) + 1}%d 00:00:${i}%02d"), i, "x",
        i.toDouble, "{}"))
    df(rows).coalesce(1).sortWithinPartitions("ts")
      .write.format(Fmt).mode("overwrite").option("blockRows", 3).save(dir)
    // rewrite the manifest FLAT, pre-r17 style: 8-field block lines inline,
    // no shard refs, no seq/maxSeq — byte-shape of an old log
    val blocks = TradeLogFormat.readManifest(dir)
    val (fs, root) = TradeLogFormat.fs(dir)
    locally {
      val o = fs.create(new org.apache.hadoop.fs.Path(root,
        TradeLogFormat.ManifestName), true)
      val legacyLines = blocks.map(b =>
        s"${b.file},${b.offset},${b.payloadLen},${b.nRows}," +
          s"${b.minTsUs},${b.maxTsUs},${b.bloomHex},${b.nCols}")
      o.write((s"${TradeLogFormat.ManifestHeader} gen=1\n" +
        legacyLines.mkString("\n")).getBytes("UTF-8"))
      o.close()
    }
    // reads: values identical, seq normalized to manifest position
    assert(canon(spark.read.format(Fmt).load(dir)) == canon(df(rows)))
    val flat = TradeLogFormat.readManifestRefs(dir)
    assert(flat.shards.isEmpty && flat.blocks.nonEmpty,
      "a flat manifest must read inline")
    assert(TradeLogFormat.readManifest(dir).map(_.seq) ==
      (0L until blocks.size))
    assert(TradeLogFormat.countBlocks(dir) == blocks.size)
    // the first commit MIGRATES: day shards appear, order and content hold
    val extra = Seq(Row(99L, ts("2024-01-04 00:00:00"), 99L, "y", 9.9, "{}"))
    df(extra).coalesce(1).write.format(Fmt).mode("append").save(dir)
    val migrated = TradeLogFormat.readManifestRefs(dir)
    assert(migrated.shards.nonEmpty, "append must shard a legacy manifest")
    val resolved = TradeLogFormat.readManifest(dir)
    assert(resolved.map(_.seq) == (0L until resolved.size),
      "migration must preserve legacy append order as seq")
    assert(canon(spark.read.format(Fmt).load(dir)) == canon(df(rows ++ extra)))
  }
}
