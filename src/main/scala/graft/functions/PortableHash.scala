package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing built only from arithmetic +
  * higher-order functions, so the exact same values are computable in
  * the DuckDB oracle SQL (list_reduce / list_transform) and in Spark
  * (aggregate / transform). Spark's builtin `hash`/`xxhash64` are
  * Spark-specific and therefore unverifiable by the oracle.
  *
  * Base hash: H(s) = fold(chars(s), 0, (acc, c) => (acc*31 + ord(c)) mod P)
  * with P = 1e9+7 (fits in ~30 bits, so a*h+b never overflows int64).
  *
  * Permutations (minhash family): perm_k(h) = (A_k * h + B_k) mod P,
  * A_k = 2k+1 (odd), B_k = 10007*k + 12345.
  *
  * All expressions are pure Catalyst built-ins — no UDF, no
  * serialization boundary; they stay inside whole-stage codegen's
  * expression eval (HOFs are interpreted per element but avoid any
  * row-level JVM closure).
  */
object PortableHash {
  val P = 1000000007L

  /** Polynomial rolling hash of a string column; empty string → 0.
    * Backed by the native codegen'd [[PolyHash]] expression (requires
    * `GraftFunctions.register(spark)` — SparkEntry wraps every query
    * with it). The interpreted HOF formulation it replaces is kept in
    * [[polyHashHofSql]] for reference/tests. */
  def polyHash(c: Column): Column = {
    import org.apache.spark.sql.functions.expr
    expr(s"graft_polyhash(${c.toString})")
  }

  /** SQL-expression text of polyHash for reuse inside lambda bodies
    * (Spark's HOF lambda variables only compose via expr strings). */
  def polyHashSql(inner: String): String =
    s"graft_polyhash($inner)"

  /** The pure-built-in (interpreted) equivalent — same values. */
  def polyHashHofSql(inner: String): String =
    s"aggregate(split($inner, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % ${P}L)"

  def permA(k: Int): Long = 2L * k + 1
  def permB(k: Int): Long = 10007L * k + 12345L

  /** k-th universal-hash permutation of an already-hashed value. */
  def perm(h: Column, k: Int): Column =
    (h * permA(k) + permB(k)) % P

  def permSql(inner: String, k: Int): String =
    s"(($inner * ${permA(k)}L + ${permB(k)}L) % ${P}L)"

  // ---- DuckDB twins (used to assemble oracle SQL strings) ----

  /** DuckDB expression computing the same value as [[polyHash]]. */
  def duckPolyHash(inner: String): String =
    s"(CASE WHEN $inner = '' THEN 0 ELSE list_reduce(list_prepend(0::BIGINT, " +
      s"list_transform(split($inner, ''), c -> ord(c)::BIGINT)), " +
      s"(acc, c) -> (acc * 31 + c) % ${P}) END)"

  def duckPerm(inner: String, k: Int): String =
    s"(($inner * ${permA(k)} + ${permB(k)}) % ${P})"
}
