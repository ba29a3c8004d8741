package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iceberg-table-format stand-in (no Iceberg jar is available offline — SURVEY.md
 * §4.3): partitioned parquet data files + an ordered JSON snapshot log giving
 *
 *  - atomic commits: data is written to an immutable per-commit directory first,
 *    then the snapshot JSON is moved into place with an atomic rename — readers
 *    resolve the table through the snapshot log only, so a crash mid-write
 *    leaves the previous snapshot intact (write-audit-publish);
 *  - per-partition lineage + metrics: every snapshot records, per partition
 *    value, the data path, row count and stage name that produced it;
 *  - exact resume: `resumableWrite` consults the completed-partition set of the
 *    stage and computes ONLY missing partitions (kill/rerun tested in LakeSpec).
 *
 * The snapshot schema mirrors the reference's manifest style
 * (ext/phrasekit/src/manifest.rs:7-16: version/counts/invariants as a JSON
 * sidecar), extended with partition entries.
 */
final class LakeTable(spark: SparkSession, val root: String) {

  private val snapDir = Paths.get(root, "snapshots")
  private val dataDir = Paths.get(root, "data")
  Files.createDirectories(snapDir)
  Files.createDirectories(dataDir)

  final case class PartitionEntry(value: String, path: String, rows: Long)
  final case class Snapshot(version: Int, stage: String, partitionCol: String,
      partitions: Seq[PartitionEntry]) {
    def totalRows: Long = partitions.map(_.rows).sum
  }

  // ---- snapshot log ----

  def snapshots: Seq[Snapshot] =
    Files.list(snapDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.matches("snapshot-\\d+\\.json"))
      .sortBy(_.getFileName.toString)
      .map(p => parseSnapshot(Files.readString(p)))

  def latest: Option[Snapshot] = snapshots.lastOption

  /** All partitions ever committed for a stage (across snapshots), latest wins. */
  def committedPartitions(stage: String): Map[String, PartitionEntry] =
    committedPartitionsAsOf(stage, Int.MaxValue)

  /** Partition state as of snapshot `asOfVersion` (inclusive): among snapshots
   * with version ≤ asOfVersion, latest entry per partition value wins. */
  def committedPartitionsAsOf(stage: String, asOfVersion: Int): Map[String, PartitionEntry] =
    snapshots.filter(s => s.stage == stage && s.version <= asOfVersion)
      .flatMap(_.partitions.map(e => e.value -> e)).toMap

  // ---- reads ----

  /** Read the current state of a stage: union of the latest entry per partition. */
  def read(stage: String): DataFrame = read(stage, Int.MaxValue)

  /** Time travel (Iceberg read-at-snapshot): the stage as it stood after
   * snapshot `asOfVersion` committed. Entries superseded by later rewrites
   * resolve back to their old data paths — commit directories are immutable
   * and never garbage-collected by this class, so every published snapshot
   * stays readable. */
  def read(stage: String, asOfVersion: Int): DataFrame = {
    val parts = committedPartitionsAsOf(stage, asOfVersion).values.toSeq
    require(parts.nonEmpty,
      s"no committed partitions for stage '$stage' as of v$asOfVersion in $root")
    spark.read.parquet(parts.map(_.path): _*)
  }

  // ---- writes ----

  /** Atomically commit `df` split by `partitionCol`, skipping partitions already
   * committed for `stage`. Returns the new snapshot (or None if nothing to do).
   * The `compute` work for skipped partitions is never executed: the partition
   * pruning happens in the plan (filter pushdown on partitionCol).
   *
   * Null partition values are REJECTED up front (they would land in
   * __HIVE_DEFAULT_PARTITION__ and break value-keyed resume); partition
   * entries are derived from the directories Spark ACTUALLY wrote — their
   * names are Hive-escaped (space/':'/'/' → %xx), so reconstructing them as
   * raw `__part=$v` would silently drop those partitions from the snapshot.
   * A missing expected directory fails the commit loudly instead. Per-
   * partition row counts come from ONE read-back aggregation job, not one
   * count() job per partition. */
  def resumableWrite(df: DataFrame, partitionCol: String, stage: String): Option[Snapshot] =
    write(df, partitionCol, stage, force = false)

  /** Rewrite ALL of df's partitions regardless of prior commits (backfill /
   * compaction verb): the new snapshot's entries supersede earlier ones for
   * the same partition values under latest-wins resolution, while
   * `read(stage, olderVersion)` still resolves the superseded data — the
   * write path of time travel. */
  def rewritePartitions(df: DataFrame, partitionCol: String, stage: String): Option[Snapshot] =
    write(df, partitionCol, stage, force = true)

  private def write(df: DataFrame, partitionCol: String, stage: String,
      force: Boolean): Option[Snapshot] = {
    val done = if (force) Set.empty[String] else committedPartitions(stage).keySet
    val allValRows = df.select(col(partitionCol).cast("string")).distinct().collect()
    require(!allValRows.exists(_.isNullAt(0)),
      s"null value in partition column '$partitionCol' — the snapshot log keys " +
        "resume on partition VALUES; filter nulls out or fill them before writing")
    val allVals = allValRows.map(_.getString(0)).sorted
    val todo = allVals.filterNot(done)
    if (todo.isEmpty) return None

    val version = latest.map(_.version + 1).getOrElse(1)
    val commitDir = dataDir.resolve(f"v$version%05d-$stage")
    val pending = df
      .filter(col(partitionCol).cast("string").isin(todo.toIndexedSeq: _*))
      .withColumn("__part", col(partitionCol).cast("string"))
    pending.write.mode("overwrite").partitionBy("__part").parquet(commitDir.toString)

    // one job: per-partition row counts from the files just written (Spark
    // unescapes __part on read, so counts are keyed by the original value)
    val counts = spark.read.parquet(commitDir.toString)
      .groupBy(col("__part").cast("string").as("p")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val writtenDirs = Files.list(commitDir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("__part="))
      .map(p => unescapePathName(p.getFileName.toString.stripPrefix("__part=")) -> p)
      .toMap
    val entries = todo.map { v =>
      val dir = writtenDirs.getOrElse(v, throw new IllegalStateException(
        s"partition dir for value '$v' missing under $commitDir — refusing to " +
          "publish a snapshot that would silently drop it"))
      val rows = counts.getOrElse(v, throw new IllegalStateException(
        s"no rows read back for partition '$v' under $commitDir"))
      PartitionEntry(v, dir.toString, rows)
    }

    val snap = Snapshot(version, stage, partitionCol, entries.toIndexedSeq)
    publish(snap)
    Some(snap)
  }

  /** Inverse of Hive's path-name escaping (%xx for reserved chars). */
  private def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Compaction: rewrite the CURRENT state of a stage as one fresh commit —
   * one contiguous file set per partition — superseding the accumulated
   * incremental commits under latest-wins resolution. Earlier snapshots stay
   * time-travelable (`read(stage, v)`); commit directories are never deleted
   * here. The small-files answer for long-running resumable/streaming stages
   * (MentionStream's per-batch commits in particular). */
  def compact(stage: String): Option[Snapshot] = {
    val pc = snapshots.filter(_.stage == stage).lastOption
      .map(_.partitionCol)
      .getOrElse(throw new IllegalArgumentException(s"no snapshots for stage '$stage'"))
    rewritePartitions(read(stage), pc, stage)
  }

  /** Stage-completion marker: a zero-partition snapshot recording that
   * `stage` finished committing ALL of its partitions. resumableWrite alone
   * makes a finished stage's rerun a write no-op, but discovering that
   * requires COMPUTING the input's distinct partition values — i.e. running
   * the stage's full upstream lineage. The marker lets resume logic skip the
   * recomputation entirely (KgPipeline.runCheckpointed consults it before
   * building each layer). */
  def markComplete(stage: String): Unit =
    publish(Snapshot(latest.map(_.version + 1).getOrElse(1), s"__done__$stage", "", Nil))

  def isComplete(stage: String): Boolean =
    snapshots.exists(_.stage == s"__done__$stage")

  /** Atomic publish: write to tmp, move into the log with ATOMIC_MOVE. */
  private def publish(s: Snapshot): Unit = {
    val tmp = Files.createTempFile(snapDir, ".tmp-snapshot", ".json")
    Files.writeString(tmp, renderSnapshot(s))
    Files.move(tmp, snapDir.resolve(f"snapshot-${s.version}%05d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  // ---- canonical JSON (stable field order — determinism contract §7.7) ----

  private def jstr(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def renderSnapshot(s: Snapshot): String = {
    val parts = s.partitions.map(e =>
      s"""{"value": ${jstr(e.value)}, "path": ${jstr(e.path)}, "rows": ${e.rows}}""")
      .mkString("[", ", ", "]")
    s"""{"version": ${s.version}, "stage": ${jstr(s.stage)}, "partition_col": ${jstr(s.partitionCol)}, "partitions": $parts}"""
  }

  // minimal parser for our own canonical output (no JSON lib offline)
  private def parseSnapshot(json: String): Snapshot = {
    def str(k: String, src: String): String = {
      val m = ("\"" + k + "\": \"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(src)
      m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse(
        throw new IllegalArgumentException(s"missing $k in snapshot"))
    }
    def num(k: String, src: String): Long =
      ("\"" + k + "\": (-?\\d+)").r.findFirstMatchIn(src).map(_.group(1).toLong)
        .getOrElse(throw new IllegalArgumentException(s"missing $k"))
    val partsBlock = "\"partitions\": \\[(.*)\\]".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val entryRe = "\\{[^{}]*\\}".r
    val entries = entryRe.findAllIn(partsBlock).map { e =>
      PartitionEntry(str("value", e), str("path", e), num("rows", e))
    }.toIndexedSeq
    Snapshot(num("version", json).toInt, str("stage", json),
      str("partition_col", json), entries)
  }
}
