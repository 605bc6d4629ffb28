package graft.stats

import graft.textan.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min Sketch (Cormode & Muthukrishnan 2005, public literature) over
  * keyed counts — the fixed-memory heavy-hitter / point-estimate structure
  * a streaming ingest keeps when the exact (term, cf) dictionary would not
  * fit an executor: depth×width cells, est(t) = min_i cell(i, h_i(t)), an
  * OVERESTIMATE by construction (collisions only ever add). Complements the
  * HLL df sketch (InvertedIndex.termStatsApprox): HLL answers "how many
  * distinct", CMS answers "how much of key t".
  *
  * Hashes are the cross-engine TextHash mixer family, so the DuckDB twin
  * builds the bit-identical sketch and the driver gate hash-matches the
  * ESTIMATES themselves — proving the sketch construction, not just an
  * error bound (the spec pins est ≥ truth and exactness-at-wide-width
  * separately).
  *
  * Scale shape: the build is one explode(depth) + hash aggregate down to
  * ≤ depth·width rows — CONSTANT memory regardless of vocabulary size, with
  * hot keys absorbed by map-side partial sums. Point queries broadcast a
  * |terms|·depth probe relation against those cells. Shard sketches MERGE
  * by cell-wise addition (the same signed-delta property the LSM term_stats
  * batches rely on), which is what makes CMS the streaming-tier monitor.
  */
object Sketches {
  val depth = 4

  /** Build the sketch: (i, cell, total) = Σ `weightCol` of all rows whose
    * `keyCol` hashes to `cell` under mixer i. Rows out ≤ depth·width. */
  def cmsBuild(items: DataFrame, keyCol: String, weightCol: String,
               width: Int): DataFrame = {
    val rows = (0 until depth).map(i => struct(lit(i).as("i"),
      (TextHash.mixCol(i, TextHash.tokenHashCol(col(keyCol))) % width).as("cell")))
    items.select(explode(array(rows: _*)).as("ic"), col(weightCol).as("w"))
      .groupBy(col("ic.i").as("i"), col("ic.cell").as("cell"))
      .agg(sum("w").as("total"))
  }

  /** Point estimates for `terms`: min over the depth probed cells; a cell
    * no key hashed to reads 0. Output (term, est). */
  def cmsEstimate(spark: SparkSession, cms: DataFrame, terms: Seq[String],
                  width: Int): DataFrame = {
    import spark.implicits._
    val probes = terms.flatMap(t => (0 until depth).map(i =>
      (t, i, TextHash.mix(i, TextHash.tokenHash(t)) % width)))
      .toDF("term", "i", "cell")
    broadcast(probes).join(cms, Seq("i", "cell"), "left")
      .na.fill(0L, Seq("total"))
      .groupBy("term").agg(min("total").as("est"))
  }

  /** scalar twin (tests): the whole sketch + estimate in memory */
  def cmsEstimateS(counts: Map[String, Long], term: String, width: Int): Long =
    (0 until depth).map { i =>
      val cell = TextHash.mix(i, TextHash.tokenHash(term)) % width
      counts.collect { case (k, w)
        if TextHash.mix(i, TextHash.tokenHash(k)) % width == cell => w }.sum
    }.min
}
