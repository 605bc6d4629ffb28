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
  case class Manifest(snapshotId: Long, parentId: Option[Long], partitions: Seq[PartitionLineage]) {
    def committed: Set[Int] = partitions.map(_.partition).toSet
  }

  private def manifestPath(tableDir: String) = Paths.get(tableDir, "_manifest.json")
  private def snapshotPath(tableDir: String, id: Long) = Paths.get(tableDir, f"_snapshot_$id%019d.json")

  def render(m: Manifest): String = {
    val parts = m.partitions.sortBy(_.partition).map(p =>
      s"""{"partition":${p.partition},"rows":${p.rows},"bytes":${p.bytes},"hashAgg":${p.hashAgg}}""")
      .mkString("[", ",", "]")
    s"""{"snapshotId":${m.snapshotId},"parentId":${m.parentId.getOrElse(-1L)},"partitions":$parts}"""
  }

  /** minimal JSON parse for our own render output (no deps available). */
  def parse(s: String): Manifest = {
    def longField(src: String, name: String): Long = {
      val re = ("\"" + name + "\":(-?\\d+)").r
      re.findFirstMatchIn(src).map(_.group(1).toLong)
        .getOrElse(sys.error(s"manifest field $name missing"))
    }
    val snapshotId = longField(s.takeWhile(_ != '['), "snapshotId")
    val parentId = longField(s.takeWhile(_ != '['), "parentId")
    val partRe = """\{"partition":(\d+),"rows":(\d+),"bytes":(\d+),"hashAgg":(-?\d+)\}""".r
    val parts = partRe.findAllMatchIn(s).map(m =>
      PartitionLineage(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong, m.group(4).toLong)).toSeq
    Manifest(snapshotId, if (parentId < 0) None else Some(parentId), parts)
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
    Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("_snapshot_") && n.endsWith(".json") =>
        n.stripPrefix("_snapshot_").stripSuffix(".json").toLong }
      .toSeq.sorted
  }

  def readSnapshot(tableDir: String, id: Long): Option[Manifest] = {
    val p = snapshotPath(tableDir, id)
    if (Files.exists(p)) Some(parse(Files.readString(p))) else None
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
