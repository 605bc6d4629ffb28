package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency ≥ 0.8 between N and 4N executors). No real cluster exists in
  * this sandbox, so per the driver instruction the SAME index-build job runs
  * at local[8] and local[32] on the same input, with
  * spark.sql.shuffle.partitions scaled with cores; efficiency =
  * (T_8 / T_32) / 4. Results land in BASELINE.md / BENCH_*.json.
  *
  * The default input is the DISTRIBUTED deterministic generator
  * ("gen:<nDocs>") rather than the tiny sf0.1 corpus: at 5,000 docs the
  * job is driver-overhead-bound and no parallelism level helps; the
  * scaling claim needs an input where compute dominates. Identical corpus
  * content at every parallelism level by construction.
  *
  * Usage: runMain graft.ScalingBench [sfDir|gen:N] [levels:8,32] [reps:2]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("gen:100000")
    val levels = args.lift(1).getOrElse("8,32").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)

    val timings = levels.map { cores =>
      // positive N -> local[N] (threads); negative -N -> local-cluster with
      // N SEPARATE single-core executor JVMs — the honest multi-executor
      // cluster proxy (thread-scaling inside one JVM hits allocator/GC
      // contention a real cluster never sees)
      val master =
        if (cores > 0) s"local[$cores]"
        else s"local-cluster[${-cores}, 1, 3072]"
      val spark = SparkSession.builder()
        .master(master)
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", math.abs(cores).toString)
        .config("spark.executor.memory", "3g")
        .config("spark.executor.extraClassPath",
          sys.props.getOrElse("java.class.path", ""))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // warmup rep amortizes JIT + parquet footer caching; best-of-reps
      // is reported (steady-state throughput, what a cluster would see)
      val runs = (0 to reps).map { _ =>
        val dir = java.nio.file.Files.createTempDirectory(s"graft-scale-$cores").toString
        val (n, sec) = Bench.buildIndex(spark, sfDir, dir)
        Bench.deleteRec(new java.io.File(dir))
        (n, sec)
      }.drop(1)
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val best = runs.map(_._2).min
      val n = runs.head._1
      println(s"""{"level":"$master","files":$n,"sec":$best,"files_per_sec":${n / best}}""")
      cores -> (n, best)
    }
    if (timings.size >= 2) {
      val (c1raw, (_, t1)) = timings.head
      val (c2raw, (n, t2)) = timings.last
      val (c1, c2) = (math.abs(c1raw), math.abs(c2raw))
      val ratio = c2.toDouble / c1
      val eff = (t1 / t2) / ratio
      println(f"""{"metric":"scaling_efficiency","n_cores":$c1,"n4_cores":$c2,"t_n_sec":$t1%.3f,"t_4n_sec":$t2%.3f,"speedup":${t1 / t2}%.3f,"efficiency":$eff%.3f,"files":$n,"sf":"$sfDir"}""")
    }
  }
}
