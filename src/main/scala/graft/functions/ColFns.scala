package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column helpers shared across operators.
  *
  * Every helper has a twin SQL-text generator (used to build the DuckDB
  * oracle queries) producing the *identical* floating-point formula, so the
  * driver's 1e-9-relative hash compare is stable. We avoid `pow()` in favor
  * of explicit multiplication because pow is not correctly rounded and may
  * differ between the JVM and DuckDB's libm.
  */
object ColFns {

  /** Clamp x into [lo, hi]. */
  def clamp(x: Column, lo: Double, hi: Double): Column =
    least(greatest(x, lit(lo)), lit(hi))

  def clampSql(x: String, lo: Double, hi: Double): String =
    s"least(greatest($x, $lo), $hi)"

  /** Standard normal CDF via the Abramowitz & Stegun 7.1.26 erf
    * approximation (|eps| < 1.5e-7) — the reference squashes signals with
    * `scipy.stats.norm.cdf` (strategy.py:139-150); Spark has no built-in
    * erf, and this closed form is expressible identically in DuckDB SQL.
    */
  def normCdf(x: Column): Column = {
    val y = x / lit(math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(y))
    val poly = t * (lit(0.254829592) +
      t * (lit(-0.284496736) +
        t * (lit(1.421413741) +
          t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val erfAbs = lit(1.0) - poly * exp(-(y * y))
    val erf = when(x >= 0, erfAbs).otherwise(-erfAbs)
    lit(0.5) * (lit(1.0) + erf)
  }

  def normCdfSql(x: String): String = {
    val y = s"(($x) / sqrt(2.0))"
    val t = s"(1.0 / (1.0 + 0.3275911 * abs($y)))"
    val poly = s"($t * (0.254829592 + $t * (-0.284496736 + $t * (1.421413741 + $t * (-1.453152027 + $t * 1.061405429)))))"
    val erfAbs = s"(1.0 - $poly * exp(-($y * $y)))"
    val erf = s"(CASE WHEN ($x) >= 0 THEN $erfAbs ELSE -$erfAbs END)"
    s"(0.5 * (1.0 + $erf))"
  }

  /** Logistic sigmoid — used by the Bayes fusion component
    * (aether_oracle.py:257-261). */
  def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  def sigmoidSql(x: String): String = s"(1.0 / (1.0 + exp(-($x))))"

  /** Driver-side md5-derived 32-bit constant: independent pseudo-random
    * draws for hash-family parameters (MinHash permutations, count-min
    * rows), computed once in Scala and inlined as the SAME literal into
    * both engines' expressions. Arithmetic families like (2i+1)*C are
    * NOT independent (see Dedup's MinhashA note) — always derive from a
    * digest. */
  def md5Const32(seed: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8"))
    d.take(4).foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))
  }

  /** Universal-hash bucket ((a*h + b) mod p) mod width — the ONE
    * definition behind every row-hash family (count-min rows, Bloom
    * positions); a and b come from [[md5Const32]] draws sized so
    * a*h < 2^57 never overflows. */
  def universalBucket(a: Long, b: Long, p: Long, width: Long,
      h: Column): Column =
    ((lit(a) * h + lit(b)) % lit(p)) % lit(width)

  def universalBucketSql(a: Long, b: Long, p: Long, width: Long,
      h: String): String =
    s"(($a * $h + $b) % $p) % $width"

  /** Deterministic 32-bit string hash both engines can compute: the first 8
    * hex digits of md5, folded positionally. Used as the shingle/token hash
    * for MinHash / SimHash so the DuckDB oracle can reproduce signatures
    * exactly (Spark's murmur `hash()` and DuckDB's `hash()` differ).
    */
  def hex32(s: Column): Column = {
    val h = md5(s)
    (1 to 8).map { i =>
      (instr(lit("0123456789abcdef"), substring(h, i, 1)).cast("long") - lit(1L)) *
        lit(1L << (4 * (8 - i)))
    }.reduce(_ + _)
  }

  def hex32Sql(s: String): String = {
    val h = s"md5($s)"
    (1 to 8).map { i =>
      s"((strpos('0123456789abcdef', substr($h, $i, 1)) - 1) * ${1L << (4 * (8 - i))})"
    }.mkString("(", " + ", ")")
  }
}
