package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Micro {
  def main(args: Array[String]): Unit = {
    val cores = args(0)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // CPU-bound: sha2 over generated strings, then hash-agg
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = spark.range(30000000L)
        .select(sha2(concat(lit("x"), col("id")), 256).as("h"))
        .select(substring(col("h"),1,2).as("k"))
        .groupBy("k").count().count()
      println(f"micro cores=$cores rep=$rep sec=${(System.nanoTime()-t0)/1e9}%.2f n=$n")
    }
    spark.stop()
  }
}
