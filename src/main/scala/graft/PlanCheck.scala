package graft
import graft.corpus.Corpus
import graft.index.{IndexWriter, InvertedIndex}
import graft.query.{QueryFrontend, Search}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** prints the physical plans of the hot paths for plan review (dev tool) */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = Corpus.fromDocuments(spark, "/root/testdata/sf0.001")
    val t = InvertedIndex.build(corpus)
    val dfs = QueryFrontend.lookupDf(t.termStats, Set("spark","join"))
    println("=== bm25TopK plan ===")
    Search.bm25TopK(t.postings, t.docStats, dfs, t.nDocs, t.avgDl, 10).explain("formatted")
    // persisted-index read path: write then read pruned
    val dir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    val cfg = IndexWriter.Config()
    val sh = IndexWriter.shardPostings(t.postings, t.docStats, t.avgDl, cfg)
    IndexWriter.write(sh, dir, 1L, cfg)
    println("=== readForTerms plan (bucket pruning + term pushdown) ===")
    IndexWriter.readForTerms(spark, dir, Seq("spark","join"), cfg).explain("formatted")
    println("=== postings build plan ===")
    InvertedIndex.postings(InvertedIndex.tokens(corpus)).explain("formatted")
    println("=== sumTfTopK plan (normalization max must be a broadcast 1-row agg, no single-partition window) ===")
    Search.sumTfTopK(t.postings, Seq("spark", "join"), 10).explain("formatted")
    spark.stop()
  }
}
