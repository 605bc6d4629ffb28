package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Micro2 {
  def main(args: Array[String]): Unit = {
    val cores = args(0)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (rep <- 1 to 3) {
      var t0 = System.nanoTime()
      // A: allocation-free codegen arithmetic
      spark.range(2000000000L).select(sum(col("id") % 7)).head()
      val tA = (System.nanoTime()-t0)/1e9
      // B: string-alloc heavy (split + explode + agg), like tokenization
      t0 = System.nanoTime()
      spark.range(3000000L)
        .select(concat(lit("aa bb cc dd ee ff gg hh "), (col("id")%1000).cast("string")).as("s"))
        .select(explode(split(col("s")," ")).as("w"))
        .groupBy("w").count().count()
      val tB = (System.nanoTime()-t0)/1e9
      println(f"micro2 cores=$cores rep=$rep arith=${tA}%.2f stringy=${tB}%.2f")
    }
    spark.stop()
  }
}
