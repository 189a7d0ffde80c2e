package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import GraftFunctions.shiftLeftC

/** ENGINE-PORTABLE transcendentals — the missing piece the BM25 / coverage
  * scaladocs kept documenting around ("no `ln` — transcendentals differ in
  * the last ulp across engines", [[LexicalRetrieval]];
  * [[TextAnalysis.charBigramCoverage]] shipped a coverage RATIO instead of
  * perplexity for the same reason). That rule is right for LIBRARY
  * transcendentals: `java.lang.Math.log` and DuckDB's libm `ln` are each
  * ≤1-ulp accurate but not bit-identical to each other. It does NOT bar
  * computing the logarithm from scratch out of operations that ARE
  * bit-identical everywhere: +, −, ×, / and integer bit ops are IEEE-754
  * correctly-rounded single instructions in every engine, so a FIXED
  * evaluation tree built only from them produces the same 64 bits on the
  * JVM, in DuckDB, and in the Python mirror — making true log-space scores
  * (LM perplexity, log-likelihoods) exactly oracle-checkable.
  *
  * [[lnPosLong]] computes `ln(n)` for a positive integer-valued long:
  *
  *  1. range-reduce with EXACT steps: `e = floor(log2 n)` via the binary
  *     string length (pure integer), `m = n / 2^e ∈ [1,2)` — one IEEE
  *     division by an exactly-representable power of two;
  *  2. `z = (m−1)/(m+1) ∈ [0, 1/3)`, then the atanh series
  *     `ln m = 2z·(1 + z²/3 + z⁴/5 + … + z²⁴/25)` evaluated as a FIXED
  *     12-term Horner chain (truncation ≤ z²⁷/27 < 3·10⁻¹⁵);
  *  3. `ln n = e·ln2 + ln m` with `ln2` a shared literal.
  *
  * Every coefficient is written as the literal division `1.0/k` (folded to
  * the same correctly-rounded double by any engine), and the oracle emits
  * the IDENTICAL tree via [[lnPosLongSqlSteps]] — validated bit-for-bit
  * against a Python IEEE mirror over n = 1..200 000, max abs error vs the
  * true log 1.3·10⁻¹⁴. Accuracy note: this is a ~1e-14-accurate ln, not a
  * 0.5-ulp ln — callers round published scores (the repo-wide `round(_, 6)`
  * contract), so the slack is 8 orders of magnitude below visibility.
  *
  * Bit-reproducibility depends on the fixed tree, so DO NOT refactor the
  * operation order here without updating [[lnPosLongSqlSteps]] and the
  * mirror test in PortableMathSpec in lockstep.
  */
object PortableMath {

  /** ln 2, the correctly-rounded double literal shared with the SQL form. */
  val Ln2: Double = 0.6931471805599453

  /** Odd reciprocals of the atanh series, OUTERMOST first: the Horner fold
    * seeds with 1/25 and wraps 1/23 … 1/3 around it. */
  private val HornerKs: Seq[Int] = Seq(23, 21, 19, 17, 15, 13, 11, 9, 7, 5, 3)

  /** `ln(n)` for a long column with n ≥ 1, bit-identical across engines.
    * n ≤ 0 is the caller's bug (counts+1 smoothing keeps every LM argument
    * ≥ 1); `bin` of a non-positive long would range-reduce garbage. */
  def lnPosLong(n: Column): Column = {
    val e = (length(bin(n)) - 1).cast("int")
    val m = n.cast("double") / shiftLeftC(lit(1L), e).cast("double")
    val z = (m - lit(1.0)) / (m + lit(1.0))
    val z2 = z * z
    val horner = HornerKs.foldLeft(lit(1.0 / 25.0): Column) {
      (acc, k) => lit(1.0 / k) + z2 * acc
    }
    val s = lit(1.0) + z2 * horner
    e.cast("double") * lit(Ln2) + lit(2.0) * (z * s)
  }

  /** The DuckDB twin of [[lnPosLong]] as lateral-alias SELECT steps: given a
    * BIGINT-typed source expression and a name prefix, returns the column
    * definitions (in dependency order) ending in `<p>_ln`. DuckDB resolves
    * aliases within the same SELECT, so the shared subterms (`z`, `z²`) are
    * named once — the textual tree stays linear and OBVIOUSLY identical to
    * the Column form above. */
  def lnPosLongSqlSteps(src: String, p: String): Seq[String] = {
    val horner = HornerKs.foldLeft("1.0/25.0") {
      (acc, k) => s"1.0/$k.0 + ${p}_z2 * ($acc)"
    }
    Seq(
      s"(length(bin(($src)::BIGINT)) - 1) AS ${p}_e",
      s"($src)::DOUBLE / ((1::BIGINT << ${p}_e)::DOUBLE) AS ${p}_m",
      s"(${p}_m - 1.0) / (${p}_m + 1.0) AS ${p}_z",
      s"${p}_z * ${p}_z AS ${p}_z2",
      s"${p}_e::DOUBLE * $Ln2 + 2.0 * (${p}_z * (1.0 + ${p}_z2 * ($horner))) AS ${p}_ln")
  }
}
