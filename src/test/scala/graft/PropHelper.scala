package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness (scalatestplus isn't in the
  * offline cache): N seeded samples of a Gen, failing fast with the seed
  * index for reproduction. */
trait PropHelper {
  def forAllG[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, seed).foreach { a =>
        try f(a)
        catch {
          case e: Throwable =>
            throw new AssertionError(s"property failed at sample $i: ${e.getMessage}", e)
        }
      }
      seed = seed.next
    }
  }
}
