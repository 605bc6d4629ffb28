package graft

import graft.registry._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the per-module registry split (round-5 refactor): the aggregated
  * driver contract must be exactly the disjoint union of the family
  * registries, with oracle twins key-aligned inside each family. */
class RegistrySpec extends AnyFunSuite {

  test("each registry's oracle twins are key-aligned with its queries") {
    SparkEntry.registries.foreach { r =>
      assert(r.queries.keySet == r.oracleSql.keySet,
        s"${r.getClass.getSimpleName}: ${r.queries.keySet.diff(r.oracleSql.keySet)} / " +
          s"${r.oracleSql.keySet.diff(r.queries.keySet)}")
    }
  }

  test("registries partition the key space (no key claimed twice)") {
    val all = SparkEntry.registries.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicated across registries: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("driver contract surface: 194 keys, queries == oracleSql") {
    assert(SparkEntry.queries.size == 194)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("every registry contributes at least one query") {
    SparkEntry.registries.foreach(r => assert(r.queries.nonEmpty))
  }
}
