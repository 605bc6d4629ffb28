package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-shaped snapshot/manifest emulation (SURVEY.md §1.2 note): the
  * sandbox has no Iceberg runtime jar, so immutable snapshot-addressed
  * table versions + per-partition lineage are emulated with parquet dirs
  * plus a JSON manifest this object owns. The contract is kept
  * Iceberg-compatible (snapshot id, append-only immutable files, atomic
  * manifest swap) so a real catalog can replace it where jars exist.
  */
object TableIO {

  case class PartitionLineage(partition: Int, rows: Long, bytes: Long, hashAgg: Long)
  /** Lineage of a named derived index artifact (champion lists, per-repo
    * term stats, …) persisted beside the bucket index under `aux/<name>` —
    * same (rows, bytes, order-insensitive hash) triple as the bucket
    * partitions, keyed by artifact name. An artifact is committed iff its
    * row is in the CURRENT manifest; postings mutations drop these rows
    * (IndexWriter.upsertBuckets), so a stale artifact can never be read as
    * current. */
  case class AuxLineage(name: String, rows: Long, bytes: Long, hashAgg: Long)
  /** `statusTime` is a DRIVER-supplied commit timestamp (reference
    * site.status_time, model/Site.java:26-30) — the engine itself stays
    * wall-clock-free; 0 = not recorded (older manifests parse to 0). */
  case class Manifest(snapshotId: Long, parentId: Option[Long],
                      partitions: Seq[PartitionLineage], statusTime: Long = 0L,
                      aux: Seq[AuxLineage] = Nil) {
    def committed: Set[Int] = partitions.map(_.partition).toSet
  }

  private def manifestPath(tableDir: String) = Paths.get(tableDir, "_manifest.json")
  private def snapshotPath(tableDir: String, id: Long) = Paths.get(tableDir, f"_snapshot_$id%019d.json")

  def render(m: Manifest): String = {
    val parts = m.partitions.sortBy(_.partition).map(p =>
      s"""{"partition":${p.partition},"rows":${p.rows},"bytes":${p.bytes},"hashAgg":${p.hashAgg}}""")
      .mkString("[", ",", "]")
    val aux = m.aux.sortBy(_.name).map(a =>
      s"""{"name":"${a.name}","rows":${a.rows},"bytes":${a.bytes},"hashAgg":${a.hashAgg}}""")
      .mkString("[", ",", "]")
    s"""{"snapshotId":${m.snapshotId},"parentId":${m.parentId.getOrElse(-1L)},""" +
      s""""statusTime":${m.statusTime},"partitions":$parts,"aux":$aux}"""
  }

  /** minimal JSON parse for our own render output (no deps available). */
  def parse(s: String): Manifest = {
    def longField(src: String, name: String, default: Option[Long] = None): Long = {
      val re = ("\"" + name + "\":(-?\\d+)").r
      re.findFirstMatchIn(src).map(_.group(1).toLong)
        .orElse(default)
        .getOrElse(sys.error(s"manifest field $name missing"))
    }
    val head = s.takeWhile(_ != '[')
    val snapshotId = longField(head, "snapshotId")
    val parentId = longField(head, "parentId")
    val statusTime = longField(head, "statusTime", Some(0L)) // absent in old manifests
    val partRe = """\{"partition":(\d+),"rows":(\d+),"bytes":(\d+),"hashAgg":(-?\d+)\}""".r
    val parts = partRe.findAllMatchIn(s).map(m =>
      PartitionLineage(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong, m.group(4).toLong)).toSeq
    // aux rows are absent in pre-aux manifests — parse to Nil (compatible)
    val auxRe = """\{"name":"([a-z0-9_]+)","rows":(\d+),"bytes":(\d+),"hashAgg":(-?\d+)\}""".r
    val aux = auxRe.findAllMatchIn(s).map(m =>
      AuxLineage(m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4).toLong)).toSeq
    Manifest(snapshotId, if (parentId < 0) None else Some(parentId), parts, statusTime, aux)
  }

  // ---- run-failure records (reference site.last_error + FAILED status,
  // model/Site.java:26-30; written by the DRIVER on abort — immutable rows,
  // never in-place status mutation) --------------------------------------
  case class FailureRecord(snapshotId: Long, statusTime: Long, error: String)

  def recordFailure(tableDir: String, snapshotId: Long, statusTime: Long, error: String): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    val esc = error.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ")
    Files.writeString(Paths.get(tableDir, f"_failed_${snapshotId}%019d_$statusTime.json"),
      s"""{"snapshotId":$snapshotId,"statusTime":$statusTime,"error":"$esc"}""")
  }

  def listFailures(tableDir: String): Seq[FailureRecord] = {
    val d = Paths.get(tableDir)
    if (!Files.exists(d)) return Nil
    listNames(d)
      .collect { case n if n.startsWith("_failed_") && n.endsWith(".json") => n }
      .sorted
      .map { n =>
        val s = Files.readString(d.resolve(n))
        val id = """"snapshotId":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
        val t = """"statusTime":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
        val e = """"error":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(s).get.group(1)
          .replace("\\\"", "\"").replace("\\\\", "\\")
        FailureRecord(id, t, e)
      }
  }

  def readCurrent(tableDir: String): Option[Manifest] = {
    val p = manifestPath(tableDir)
    if (Files.exists(p)) Some(parse(Files.readString(p))) else None
  }

  /** Atomic commit: write snapshot file, then swap the current-manifest
    * pointer via atomic move — a killed run leaves either the old or the
    * new manifest, never a torn one. */
  def commit(tableDir: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    Files.writeString(snapshotPath(tableDir, m.snapshotId), render(m))
    val tmp = Paths.get(tableDir, s"_manifest.tmp.${m.snapshotId}")
    Files.writeString(tmp, render(m))
    Files.move(tmp, manifestPath(tableDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def listSnapshots(tableDir: String): Seq[Long] = {
    val d = Paths.get(tableDir)
    if (!Files.exists(d)) return Nil
    listNames(d)
      .collect { case n if n.startsWith("_snapshot_") && n.endsWith(".json") =>
        n.stripPrefix("_snapshot_").stripSuffix(".json").toLong }
      .sorted
  }

  /** directory listing with the stream CLOSED (Files.list holds an fd until
    * closed — a polling status surface must not leak one per call) */
  private def listNames(d: java.nio.file.Path): Seq[String] = {
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }

  def readSnapshot(tableDir: String, id: Long): Option[Manifest] = {
    val p = snapshotPath(tableDir, id)
    if (Files.exists(p)) Some(parse(Files.readString(p))) else None
  }

  /** Expire old snapshot metadata (Iceberg `expire_snapshots` analog):
    * keep the newest `keep` snapshot files — always including the one the
    * current manifest points to — and delete older ones. Data files are
    * NOT touched: mutations rewrite bucket dirs in place, so non-current
    * snapshot manifests are metadata-only history whose data is already
    * superseded; expiry bounds the metadata file count on a long-lived
    * table (one JSON per commit otherwise accumulates forever). Returns
    * the expired snapshot ids. */
  def expireSnapshots(tableDir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least one snapshot")
    val current = readCurrent(tableDir).map(_.snapshotId)
    val all = listSnapshots(tableDir) // ascending
    val keepSet = all.takeRight(keep).toSet ++ current
    val expired = all.filterNot(keepSet)
    expired.foreach(id => Files.deleteIfExists(snapshotPath(tableDir, id)))
    expired
  }

  /** Corpus-level scoring constants the index was encoded with — needed to
    * score queries in a later session (BM25 avgdl must match the block-max
    * metadata baked into the posting bytes). */
  case class IndexMeta(nDocs: Long, avgDl: Double)
  def writeMeta(tableDir: String, meta: IndexMeta): Unit = {
    Files.createDirectories(Paths.get(tableDir))
    Files.writeString(Paths.get(tableDir, "_meta.json"),
      s"""{"nDocs":${meta.nDocs},"avgDl":${meta.avgDl}}""")
  }
  def readMeta(tableDir: String): Option[IndexMeta] = {
    val p = Paths.get(tableDir, "_meta.json")
    if (!Files.exists(p)) return None
    val s = Files.readString(p)
    val n = """"nDocs":(\d+)""".r.findFirstMatchIn(s).get.group(1).toLong
    val a = """"avgDl":([-0-9.eE]+)""".r.findFirstMatchIn(s).get.group(1).toDouble
    Some(IndexMeta(n, a))
  }
}
