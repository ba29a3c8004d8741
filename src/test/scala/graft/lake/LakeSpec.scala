package graft.lake

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import graft.SparkSuite

/**
 * LakeTable: atomic snapshot commits, per-partition lineage + metrics, and the
 * kill/rerun exact-resume contract (BASELINE.md "Resumability").
 */
class LakeSpec extends SparkSuite {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-lake").toString

  private def sample = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0),
    (4L, "b", 40.0), (5L, "c", 50.0)).toDF("id", "bucket", "v")

  test("commit + read roundtrip with per-partition metrics") {
    val t = new LakeTable(spark, tmpRoot())
    val snap = t.resumableWrite(sample, "bucket", "stage1").get
    assert(snap.version == 1)
    assert(snap.partitions.map(e => e.value -> e.rows).toMap ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    val back = t.read("stage1")
    assert(back.count() == 5)
    assert(back.select(sum("id")).head().getLong(0) == 15L)
  }

  test("kill/rerun: a crashed partial commit is invisible; rerun computes only missing partitions") {
    val root = tmpRoot()
    val t = new LakeTable(spark, root)
    // run 1 commits only buckets a,b (simulating the state after a crash that
    // happened before the c-partition work was scheduled)
    t.resumableWrite(sample.filter(col("bucket").isin("a", "b")), "bucket", "s").get
    // simulate a crash DURING the next commit: data dir written, snapshot NOT
    // published — write-audit-publish means readers never see it
    val orphan = Paths.get(root, "data", "v99999-s")
    sample.filter(col("bucket") === "c").withColumn("__part", col("bucket"))
      .write.mode("overwrite").partitionBy("__part").parquet(orphan.toString)
    val t2 = new LakeTable(spark, root)
    assert(t2.committedPartitions("s").keySet == Set("a", "b")) // orphan invisible

    // rerun over the FULL input: only bucket c is recomputed/committed
    val snap2 = t2.resumableWrite(sample, "bucket", "s").get
    assert(snap2.partitions.map(_.value) == Seq("c"))
    assert(snap2.version == 2)
    // table state is exact: all 5 rows, no duplicates from the re-run
    val back = t2.read("s")
    assert(back.count() == 5)
    assert(back.select(sum("v")).head().getDouble(0) == 150.0)
    // third run is a no-op
    assert(t2.resumableWrite(sample, "bucket", "s").isEmpty)
  }

  test("time travel: read-at-version resolves superseded partitions to old data") {
    val t = new LakeTable(spark, tmpRoot())
    val v1 = t.resumableWrite(sample, "bucket", "stage1").get.version
    // rewrite partition 'a' with different rows (backfill); 'b'/'c' untouched
    val fixed = Seq((10L, "a", 99.0)).toDF("id", "bucket", "v")
    val v2 = t.rewritePartitions(fixed, "bucket", "stage1").get.version
    assert(v2 == v1 + 1)
    // current read: new 'a' (1 row), old 'b'/'c'
    assert(t.read("stage1").count() == 4)
    assert(t.read("stage1").filter(col("bucket") === "a").select(sum("id"))
      .head().getLong(0) == 10L)
    // as-of v1: the superseded 'a' rows are still readable
    val old = t.read("stage1", v1)
    assert(old.count() == 5)
    assert(old.filter(col("bucket") === "a").select(sum("id")).head().getLong(0) == 3L)
    // resumableWrite after the rewrite still sees every partition as done
    assert(t.resumableWrite(sample, "bucket", "stage1").isEmpty)
    // a reopened table resolves the same histories (log is the source of truth)
    val t2 = new LakeTable(spark, t.root)
    assert(t2.read("stage1", v1).count() == 5 && t2.read("stage1").count() == 4)
  }

  test("compact: current state rewritten in one commit; history stays travelable") {
    val t = new LakeTable(spark, tmpRoot())
    t.resumableWrite(sample.filter(col("bucket").isin("a", "b")), "bucket", "s")
    val v2 = t.resumableWrite(sample, "bucket", "s").get.version // commits c
    val before = t.read("s").select("id", "bucket", "v")
      .as[(Long, String, Double)].collect().toSet
    val snap = t.compact("s").get
    assert(snap.version == v2 + 1)
    // one commit now carries every partition of the current state
    assert(snap.partitions.map(_.value).sorted.toSeq == Seq("a", "b", "c"))
    assert(t.read("s").select("id", "bucket", "v")
      .as[(Long, String, Double)].collect().toSet == before)
    // pre-compaction snapshots still resolve
    assert(t.read("s", v2).select("id", "bucket", "v")
      .as[(Long, String, Double)].collect().toSet == before)
    assert(t.read("s", v2 - 1).count() == 4) // a+b only
    // compacting an unknown stage is a loud error
    intercept[IllegalArgumentException](t.compact("nope"))
  }

  test("snapshot log is ordered and lineage survives reopen") {
    val root = tmpRoot()
    val t = new LakeTable(spark, root)
    t.resumableWrite(sample.filter(col("bucket") === "a"), "bucket", "m")
    t.resumableWrite(sample, "bucket", "m")
    val reopened = new LakeTable(spark, root)
    val snaps = reopened.snapshots
    assert(snaps.map(_.version) == Seq(1, 2))
    assert(snaps.head.stage == "m" && snaps.head.partitionCol == "bucket")
    assert(reopened.committedPartitions("m").keySet == Set("a", "b", "c"))
    assert(reopened.read("m").count() == 5)
  }

  test("stages are independent namespaces") {
    val t = new LakeTable(spark, tmpRoot())
    t.resumableWrite(sample, "bucket", "x")
    assert(t.committedPartitions("y").isEmpty)
    intercept[IllegalArgumentException](t.read("y"))
  }

  test("version ordering is numeric, not lexicographic (100000 > 99999)") {
    // %05d padding stops at 5 digits: 'snapshot-100000.json' sorts BEFORE
    // 'snapshot-99999.json' lexicographically, which would regress `latest`
    // and make the next write reuse (and under ATOMIC_MOVE, silently clobber)
    // an existing version (round-3 ADVICE).
    val root = tmpRoot()
    val snapDir = Paths.get(root, "snapshots")
    Files.createDirectories(snapDir)
    Files.writeString(snapDir.resolve("snapshot-99999.json"),
      """{"version": 99999, "stage": "s", "partition_col": "bucket", "partitions": [{"value": "old", "path": "/nope", "rows": 1}]}""")
    Files.writeString(snapDir.resolve("snapshot-100000.json"),
      """{"version": 100000, "stage": "s", "partition_col": "bucket", "partitions": []}""")
    val t = new LakeTable(spark, root)
    assert(t.latest.get.version == 100000)
    val snap = t.resumableWrite(sample.filter(col("bucket") === "a"), "bucket", "s2").get
    assert(snap.version == 100001) // head advances; no clobber of an existing file
    assert(Files.exists(snapDir.resolve("snapshot-99999.json")))
  }

  test("over-wide partition column fails with a diagnostic, not an OOM") {
    val t = new LakeTable(spark, tmpRoot(), maxPartitionsPerWrite = 3)
    val wide = (1 to 10).map(i => (i.toLong, s"p$i", 1.0)).toDF("id", "bucket", "v")
    val e = intercept[IllegalArgumentException](t.resumableWrite(wide, "bucket", "s"))
    assert(e.getMessage.contains("distinct values") && e.getMessage.contains("Bucket it"))
    // within the bound still works
    assert(t.resumableWrite(sample.filter(col("bucket").isin("a", "b")),
      "bucket", "s").get.partitions.size == 2)
  }

  test("snapshot log is cached per instance: repeated reads cost zero re-parses") {
    val root = tmpRoot()
    val t = new LakeTable(spark, root)
    (1 to 5).foreach(i => t.resumableWrite(
      sample.withColumn("bucket", concat(col("bucket"), lit(i.toString))), "bucket", "ing"))
    val after = t.parseCount
    // a long-running ingest calls committedPartitions/latest per micro-batch:
    // with the round-3 rescan-per-call this was O(batches²) driver JSON parses
    (1 to 50).foreach { _ =>
      t.committedPartitions("ing"); t.latest; t.isComplete("ing")
    }
    assert(t.parseCount == after, s"cache miss: ${t.parseCount} != $after")
    // a REOPEN (new instance) re-scans once and then also stays cached
    val t2 = new LakeTable(spark, root)
    t2.committedPartitions("ing")
    val p2 = t2.parseCount
    (1 to 50).foreach(_ => t2.committedPartitions("ing"))
    assert(t2.parseCount == p2)
  }

  test("concurrent writers: version collision retries; same-stage overlap fails loudly") {
    val root = tmpRoot()
    val a = new LakeTable(spark, root)
    val b = new LakeTable(spark, root)
    b.committedPartitions("s") // warm B's cache BEFORE A commits (stale view)
    a.resumableWrite(sample.filter(col("bucket").isin("a", "b")), "bucket", "s")
    // B races to version 1 with overlapping partitions a,b: the create-if-
    // absent link loses, the retry re-reads the log, sees the overlap and
    // refuses — under round-3's ATOMIC_MOVE publish B would have silently
    // REPLACED A's snapshot, losing its committed partitions.
    val e = intercept[java.util.ConcurrentModificationException](
      b.resumableWrite(sample, "bucket", "s"))
    assert(e.getMessage.contains("concurrent writer"))
    assert(new LakeTable(spark, root).committedPartitions("s").keySet == Set("a", "b"))
    // the aborted write retracted its unpublished data directory (WAP): no
    // orphan full-stage copy leaks per failed attempt
    val dataDirs = Files.list(Paths.get(root, "data")).iterator().asScala.size
    assert(dataDirs == 1, s"aborted write leaked a commit dir ($dataDirs present)")
    // rerun against the merged state resumes cleanly: only 'c' is missing
    assert(b.resumableWrite(sample, "bucket", "s").get.partitions.map(_.value) == Seq("c"))

    // DIFFERENT stages racing to one version: loser retries at the next head
    val c = new LakeTable(spark, root)
    c.committedPartitions("s") // warm (stale after d's write below)
    val d = new LakeTable(spark, root)
    d.resumableWrite(sample, "bucket", "other1")
    val snap = c.resumableWrite(sample, "bucket", "other2").get
    val all = new LakeTable(spark, root).snapshots
    assert(all.count(_.stage == "other1") == 1 && all.count(_.stage == "other2") == 1)
    assert(all.map(_.version) == all.map(_.version).distinct.sorted)
    assert(snap.version == all.map(_.version).max)
  }

  test("compactMetadata: log folds to one checkpoint; state identical; history below horizon expires") {
    val root = tmpRoot()
    val t = new LakeTable(spark, root)
    t.resumableWrite(sample.filter(col("bucket").isin("a", "b")), "bucket", "s")
    val vMid = t.resumableWrite(sample, "bucket", "s").get.version
    t.rewritePartitions(Seq((10L, "a", 99.0)).toDF("id", "bucket", "v"), "bucket", "s")
    t.resumableWrite(sample, "bucket", "other")
    t.markComplete("s")
    val before = t.read("s").select("id", "bucket", "v")
      .as[(Long, String, Double)].collect().toSet
    def logNames() = Files.list(Paths.get(root, "snapshots")).iterator().asScala
      .map(_.getFileName.toString).filter(_ != "_checkpoints").toList
    def ckptNames() = Files.list(Paths.get(root, "snapshots", "_checkpoints"))
      .iterator().asScala.map(_.getFileName.toString).toList
    assert(logNames().size == 5)
    t.compactMetadata()
    assert(logNames().isEmpty && ckptNames().size == 1 &&
      ckptNames().head.startsWith("checkpoint-"), (logNames(), ckptNames()).toString)
    // identical current state through the SAME instance and a reopen
    assert(t.read("s").select("id", "bucket", "v")
      .as[(Long, String, Double)].collect().toSet == before)
    val re = new LakeTable(spark, root)
    assert(re.read("s").select("id", "bucket", "v")
      .as[(Long, String, Double)].collect().toSet == before)
    assert(re.read("other").count() == 5)
    assert(re.isComplete("s") && !re.isComplete("other"))
    // time travel below the horizon is expired — loudly
    val e = intercept[IllegalArgumentException](re.read("s", vMid))
    assert(e.getMessage.contains("expired"))
    // the log keeps moving: next write versions from the horizon up
    val v = re.resumableWrite(sample, "bucket", "post").get.version
    assert(v > re.snapshots.filter(_.stage == "s").map(_.version).max)
    assert(re.read("post").count() == 5)
  }

  test("compactMetadata is idempotent and survives a compaction racing a stale writer") {
    val root = tmpRoot()
    val a = new LakeTable(spark, root)
    a.resumableWrite(sample, "bucket", "s")
    a.compactMetadata()
    val stateAfter = a.read("s").count()
    // idempotent: nothing committed since → no-op, not a false
    // concurrent-compaction error (maintenance loops call this periodically)
    a.compactMetadata()
    assert(a.read("s").count() == stateAfter)

    // a writer whose cached view predates a compaction must NOT be able to
    // link a snapshot below the new checkpoint horizon (every future scan
    // would ignore it — silent commit loss). publishAt retracts the link and
    // retries above the horizon.
    val stale = new LakeTable(spark, root)
    stale.committedPartitions("s") // warm the stale cache
    a.resumableWrite(sample, "bucket", "extra")
    a.compactMetadata() // horizon advances; per-commit files deleted
    val snap = stale.resumableWrite(sample, "bucket", "late").get
    val fresh = new LakeTable(spark, root)
    assert(fresh.read("late").count() == 5, "racing commit must stay visible")
    assert(fresh.snapshots.filter(_.stage == "late").map(_.version) == Seq(snap.version))
    // and it landed ABOVE the horizon (sub-horizon versions are expired space)
    assert(snap.version > fresh.snapshots.filter(_.stage == "extra").map(_.version).max)
  }

  test("pipeline-level checkpointed run: rerun is a snapshot no-op with equal output") {
    val root = tmpRoot()
    val pages = graft.corpus.Synth.corpus(spark, 150)
    val t1 = graft.kg.KgPipeline.runCheckpointed(spark, pages, root, buckets = 4)
    val rows1 = t1.count()
    val versions1 = new LakeTable(spark, root).snapshots.map(_.version)
    val t2 = graft.kg.KgPipeline.runCheckpointed(spark, pages, root, buckets = 4)
    val versions2 = new LakeTable(spark, root).snapshots.map(_.version)
    assert(versions1 == versions2) // nothing recommitted
    assert(t2.count() == rows1 && rows1 > 0)
  }

  test("partial resume does not mix corpora: background scores from the lake, not the new pages arg") {
    // round-3 ADVICE: with cleaned complete but mentions/entities not, the
    // docs came from the committed lake layer while the BACKGROUND n-gram
    // table was recomputed from the CURRENT pages argument — a resume after
    // the input changed silently scored old docs against a new-corpus
    // background. Pin: resuming with a DIFFERENT corpus must produce the
    // same triples as an uninterrupted run over the ORIGINAL corpus.
    val pages1 = graft.corpus.Synth.corpus(spark, 150)
    val cfg = graft.kg.KgPipeline.KgConfig()
    val expected = graft.kg.KgPipeline
      .runCheckpointed(spark, pages1, tmpRoot(), buckets = 4)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet

    // crash simulation: only the input layers (cleaned + background) landed
    val root = tmpRoot()
    val lake = new LakeTable(spark, root)
    val bucketed4 = (df: org.apache.spark.sql.DataFrame, key: String) =>
      df.withColumn("bucket", pmod(xxhash64(col(key)), lit(4L)))
    lake.resumableWrite(bucketed4(
      graft.kg.KgPipeline.cleanedDocs(pages1, cfg), "docId"), "bucket", "cleaned")
    lake.markComplete("cleaned")
    lake.resumableWrite(bucketed4(
      graft.kg.KgPipeline.backgroundFromPages(pages1, cfg), "ngram"), "bucket", "background")
    lake.markComplete("background")

    // resume with a CHANGED pages argument — it must be ignored entirely
    val pages2 = graft.corpus.Synth.corpus(spark, 40)
    val resumed = graft.kg.KgPipeline.runCheckpointed(spark, pages2, root, buckets = 4)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(resumed == expected && expected.nonEmpty)
  }

  test("changed-input resume with INCOMPLETE input layers fails loudly (corpus fingerprint gate)") {
    // With cleaned data committed but NOT marked complete, a resume whose
    // pages argument changed would fill the missing buckets from the new
    // corpus while committed buckets hold the old one — mixing corpora
    // inside the cleaned layer itself (commit ordering cannot prevent this;
    // resumableWrite rightly skips committed buckets). The intent-first
    // input fingerprint turns that into a loud failure.
    val root = tmpRoot()
    val lake = new LakeTable(spark, root)
    val cfg = graft.kg.KgPipeline.KgConfig()
    val pages1 = graft.corpus.Synth.corpus(spark, 100)
    import spark.implicits._
    val fp1 = graft.kg.KgPipeline.corpusFingerprint(pages1)
    lake.resumableWrite(Seq(fp1).toDF("fp").withColumn("part", lit(fp1)),
      "part", graft.kg.KgPipeline.inputFpStage)
    lake.resumableWrite(
      graft.kg.KgPipeline.cleanedDocs(pages1, cfg)
        .withColumn("bucket", pmod(xxhash64(col("docId")), lit(4L))),
      "bucket", "cleaned") // crash before markComplete("cleaned")
    val pages2 = graft.corpus.Synth.corpus(spark, 40)
    val ex = intercept[IllegalStateException] {
      graft.kg.KgPipeline.runCheckpointed(spark, pages2, root, buckets = 4)
    }
    assert(ex.getMessage.contains("corpus mismatch"), ex.getMessage)
    // same-corpus resume proceeds normally through the gate
    val trip = graft.kg.KgPipeline.runCheckpointed(spark, pages1, root, buckets = 4)
    assert(trip.count() > 0)
  }

  test("partial resume: triples rebuilt from committed mention/entity layers, no upstream recompute") {
    val root = tmpRoot()
    val pages = graft.corpus.Synth.corpus(spark, 150)
    val expected = graft.kg.KgPipeline.runCheckpointed(spark, pages, root, buckets = 4)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    // kill simulation: drop the triple stage (data snapshots + marker) only
    val snapDir = java.nio.file.Paths.get(root, "snapshots")
    java.nio.file.Files.list(snapDir).iterator().asScala.toList
      .filter(java.nio.file.Files.isRegularFile(_))
      .filter { p =>
        val s = java.nio.file.Files.readString(p)
        s.contains("\"stage\": \"triples\"") || s.contains("\"stage\": \"__done__triples\"")
      }
      .foreach(java.nio.file.Files.delete)
    // rerun with a DIFFERENT (smaller) corpus: the mentions+entities-complete
    // branch must rebuild triples purely from the lake layers — if it wrongly
    // recomputed from `pages`, the output would reflect the new corpus
    val other = graft.corpus.Synth.corpus(spark, 10)
    val resumed = graft.kg.KgPipeline.runCheckpointed(spark, other, root, buckets = 4)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet
    assert(resumed == expected && expected.nonEmpty)
  }
}
