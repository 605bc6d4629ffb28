package graft.textan

import graft.corpus.Corpus
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing. Everything here has three identical
  * implementations: pure Scala (oracle/tests), a codegen'd Spark Column
  * (engine), and a DuckDB SQL fragment (driver oracle) — so MinHash/SimHash/
  * fingerprint outputs are bit-identical across all three.
  *
  * Base hash: 31-ary polynomial over code points, mod p = 2^31 − 1
  * (Mersenne). Mixers: h_i(x) = (a_i·x + b_i) mod p with a_i, b_i derived
  * from splitmix64(seed=i) — all operands < 2^31 so int64 arithmetic never
  * overflows in either engine (DuckDB BIGINT is overflow-checked).
  */
object TextHash {
  val P: Long = 2147483647L // 2^31 - 1

  def tokenHash(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % P)

  /** native codegen'd Catalyst expression (graft.functions.TokenHashExpr) —
    * tight char loop instead of the interpreted HOF fold below */
  def tokenHashCol(c: Column): Column =
    graft.functions.TokenHashExpr.token_hash(c)

  /** the composable built-ins-only form, kept as the reference twin the
    * native expression is tested against */
  def tokenHashColHof(c: Column): Column =
    aggregate(split(c, ""), lit(0L), (acc, ch) => (acc * 31 + ascii(ch)) % P)

  def tokenHashSql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(regexp_split_to_array($expr, ''), " +
      s"c -> CAST(unicode(c) AS BIGINT))), (a, b) -> (a * 31 + b) % $P)"

  /** mixer coefficients for hash function family member i (stable) */
  def mixer(i: Int): (Long, Long) = {
    val a = (Corpus.splitmix64(0xA11CE + i) & 0x7FFFFFFFL) % (P - 1) + 1 // in [1, p-1]
    val b = Corpus.splitmix64(0xB0B + i) & 0x7FFFFFFFL                   // in [0, 2^31)
    (a, b % P)
  }
  def mix(i: Int, x: Long): Long = { val (a, b) = mixer(i); (a * x + b) % P }
  def mixCol(i: Int, x: Column): Column = { val (a, b) = mixer(i); (x * lit(a) + lit(b)) % lit(P) }
  def mixSql(i: Int, expr: String): String = { val (a, b) = mixer(i); s"(($expr) * $a + $b) % $P" }
}
