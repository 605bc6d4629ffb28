package graft

import org.apache.spark.sql.SparkSession

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency ≥ 0.8 between N and 4N executors). No real cluster exists in
  * this sandbox, so per the driver instruction the SAME index-build job runs
  * at local[8] and local[32] on the same input, with
  * spark.sql.shuffle.partitions scaled with cores; efficiency =
  * (T_8 / T_32) / 4. Results land in BASELINE.md / BENCH_*.json.
  *
  * Usage: runMain graft.ScalingBench [sfDir] [levels:8,32] [reps:2]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val levels = args.lift(1).getOrElse("8,32").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)

    val timings = levels.map { cores =>
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", cores.toString)
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
      println(s"""{"level":"local[$cores]","files":$n,"sec":$best,"files_per_sec":${n / best}}""")
      cores -> (n, best)
    }
    if (timings.size >= 2) {
      val (c1, (_, t1)) = timings.head
      val (c2, (n, t2)) = timings.last
      val ratio = c2.toDouble / c1
      val eff = (t1 / t2) / ratio
      println(f"""{"metric":"scaling_efficiency","n_cores":$c1,"n4_cores":$c2,"t_n_sec":$t1%.3f,"t_4n_sec":$t2%.3f,"speedup":${t1 / t2}%.3f,"efficiency":$eff%.3f,"files":$n,"sf":"$sfDir"}""")
    }
  }
}
