package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A per-module slice of the driver contract: harness queries plus their
  * DuckDB oracle twins, aggregated by [[graft.SparkEntry]]. Key sets of
  * `queries` and `oracleSql` are identical within each registry
  * (RegistrySpec pins it, along with cross-registry disjointness). */
private[graft] trait QueryRegistry {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
