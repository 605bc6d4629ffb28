package graft

import graft.corpus.Corpus
import graft.index.{IndexWriter, InvertedIndex}
import graft.io.TableIO
import org.apache.spark.sql.SparkSession

object Bench {

  /** Full index-build pipeline, timed end-to-end: corpus scan → tokenize →
    * tf/df/dl aggregates → per-(term,shard) encode → salted merge → snapshot
    * write with lineage. Returns (nDocs, seconds).
    * `source` is either an sfDir path or "gen:<nDocs>" (distributed
    * deterministic generator — same content at any parallelism). */
  def buildIndex(spark: SparkSession, source: String, outDir: String): (Long, Double) = {
    val t0 = System.nanoTime()
    def phase(name: String, t: Long): Long = {
      val now = System.nanoTime()
      if (sys.env.contains("BENCH_PHASES"))
        System.err.println(f"[phase] $name: ${(now - t) / 1e9}%.2fs")
      now
    }
    // corpus is consumed by exactly ONE pass (tokenize→postings): stream
    // it, don't cache. nDocs comes from the generator size (gen) or the
    // parquet metadata count.
    val gen = source.startsWith("gen:")
    val corpus =
      if (gen) Corpus.generateDistributed(spark, source.stripPrefix("gen:").toLong, 32)
      else Corpus.fromDocuments(spark, source)
    val tables = InvertedIndex.build(corpus,
      knownNDocs = if (gen) source.stripPrefix("gen:").toLong else -1L)
    var t = phase("aggregates(nDocs+avgDl)", t0)
    // fused encode: ONE exchange lands rows in their final (bucket, salt)
    // write placement before encoding, so write() skips its post-encode
    // repartition of the multi-KB blobs (preArranged) — removes two
    // exchanges + a stage barrier from the measured full-build path
    val shards = IndexWriter.shardPostingsAligned(tables.postings, tables.docStats, tables.avgDl)
    IndexWriter.write(shards, outDir, snapshotId = 1L, resume = false, preArranged = true)
    TableIO.writeMeta(outDir, TableIO.IndexMeta(tables.nDocs, tables.avgDl))
    t = phase("encode+write+lineage", t)
    tables.postings.unpersist() // reps would otherwise accumulate caches
    val secs = (System.nanoTime() - t0) / 1e9
    (tables.nDocs, secs)
  }

  def deleteRec(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles().foreach(deleteRec)
    p.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline: index-build throughput (files/sec) — BASELINE.json metric.
    // One small untimed warmup first: the timed figure should reflect
    // steady-state throughput (what a long-running cluster job sees), not
    // first-run JIT compilation.
    val warmDir = java.nio.file.Files.createTempDirectory("graft-bench-warm").toString
    buildIndex(spark, "gen:20000", warmDir)
    deleteRec(new java.io.File(warmDir))
    val idxDir = java.nio.file.Files.createTempDirectory("graft-bench-idx").toString
    val (nDocs, buildSec) = buildIndex(spark, sfDir, idxDir)
    deleteRec(new java.io.File(idxDir))
    val filesPerSec = nDocs / buildSec

    // query set timings (each forces full execution via count)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("index_build") = buildSec
    // ONE-TIME aux-artifact build (persisted bucket index + champions +
    // per-repo stats + kgrams + SQ8 codes + bootstrap metric relations),
    // timed as its own entry so no _persisted query absorbs it and the
    // per-query ledger stays comparable round-over-round
    val tAux = System.nanoTime()
    SparkEntry.persistedAux(spark, sfDir)
    results("index_aux_build") = (System.nanoTime() - tAux) / 1e9
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => results(name) = -1.0 }
      if (!results.contains(name)) results(name) = (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // scaling efficiency is measured by graft.ScalingBench (separate
    // executor JVMs, two levels, fixed generated input), which RECORDS its
    // summary to tools/scaling_latest.json; this bench only relays that
    // recorded result (never a constant posing as an in-run measurement)
    // same resolution rule as the writer (ScalingBench's SCALING_OUT), so
    // launching from a different cwd can't silently yield null
    val scalingRecorded = {
      val p = java.nio.file.Paths.get(
        sys.env.getOrElse("SCALING_OUT", "tools/scaling_latest.json"))
      if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p).trim
      else "null"
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""index_build_sec":$buildSec,"index_files":$nDocs,"files_per_sec":$filesPerSec,""" +
      s""""cpus":$cpus,"sf":"$sfDir",""" +
      s""""scaling_recorded":$scalingRecorded,""" +
      s""""scaling_method":"recorded by graft.ScalingBench: local-cluster[2,1] vs local-cluster[8,1] (ActiveProcessorCount-pinned executor JVMs), paired-run series with platform calibration, per-level minima; series in BASELINE.md"}""")
    spark.stop()
  }
}
