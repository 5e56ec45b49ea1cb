package graft.functions

/** Deterministic fixed-point ln for UNBOUNDED positive integers — the
  * missing piece beside [[graft.text.Entropy]]'s exact small-integer table
  * (which stops at 2048 and fails loudly above it). Corpus-level statistics
  * (feature totals, document-frequency denominators, importance-weight
  * ratios) need ln of data-dependent counts that grow with the data, so no
  * finite exact table can cover them; engine `log()` is banned by the
  * repo's parity rule (JVM ln is 1-ulp, not correctly rounded — DuckDB's
  * differs in the last bit often enough to break hash-compares).
  *
  * The classical fix: normalize to mantissa × 2^exponent and look the
  * mantissa up. For x with bit length b > [[MantissaBits]],
  *
  *   ln x ≈ lnS(x >> (b − [[MantissaBits]])) + (b − [[MantissaBits]])·ln 2
  *
  * where the shifted value lands in [2^([[MantissaBits]]−1), 2^[[MantissaBits]])
  * and is served by the same [[Table]] that serves small x exactly. Both
  * engines compute bit length as `length(bin(x))` (verified: neither pads —
  * bin(5)='101', bin(2047)= 11 chars on Spark AND DuckDB), shift with
  * native integer ops, and read the SAME inlined literal table — so the
  * approximation is bit-identical everywhere, including the Scala twin
  * [[lnS]] used by specs and plan-time constants.
  *
  * Truncation drops the low b−11 bits, so the result UNDERSTATES ln x by at
  * most ln(1 + 1/1024) < 2^−10 nats — three decimal digits of ln, plenty
  * for the scoring/ranking consumers (importance weights, KL audits), and
  * the error is the SAME deterministic value in every engine, which is what
  * the hash-compare actually needs. Consumers needing exact small-count ln
  * keep using [[graft.text.Entropy.LnTable]].
  *
  * Scale: the lookup is a broadcast join against a 2047-row literal table;
  * the key/excess arithmetic is pure codegen column math. Nothing here
  * shuffles.
  */
object ScaledLn {

  /** Fixed-point scale (units of 1e-12 nats) — same as Entropy.LnScale. */
  val Scale = 1000000000000L

  /** Mantissa width: values shorter than this many bits are exact. */
  val MantissaBits = 11

  /** Largest exactly-tabled value = 2^[[MantissaBits]] − 1. */
  val TableMax: Int = (1 << MantissaBits) - 1

  /** round(ln 2 · [[Scale]]) — the per-octave excess term. */
  val Ln2S: Long = math.rint(math.log(2) * Scale).toLong

  /** mk → round(ln(mk)·[[Scale]]) for mk = 1..[[TableMax]]; the single
    * literal table both engines inline.
    */
  val Table: IndexedSeq[(Int, Long)] =
    (1 to TableMax).map(k => k -> math.rint(math.log(k) * Scale).toLong)

  /** Scala twin: lnS(x) in [[Scale]]ths, bit-identical to what either
    * engine's key+excess+lookup computes.
    */
  def lnS(x: Long): Long = {
    require(x >= 1, s"lnS needs x >= 1, got $x")
    val b = 64 - java.lang.Long.numberOfLeadingZeros(x)
    if (b <= MantissaBits) Table(x.toInt - 1)._2
    else Table((x >> (b - MantissaBits)).toInt - 1)._2 + (b - MantissaBits) * Ln2S
  }

  /** VALUES body `(mk,mln),(…)` for a `ln_mant(mk, mln)` CTE in DuckDB. */
  def tableValuesSql: String =
    Table.map { case (k, v) => s"($k,$v)" }.mkString(",")

  /** Spark SQL fragment: the table key for `x` (a BIGINT ≥ 1 expression). */
  def keySparkSql(x: String): String =
    s"(CASE WHEN length(bin($x)) <= $MantissaBits THEN $x " +
      s"ELSE shiftright($x, length(bin($x)) - $MantissaBits) END)"

  /** Spark SQL fragment: the octave excess to ADD to the looked-up mln. */
  def excessSparkSql(x: String): String =
    s"(cast(greatest(length(bin($x)) - $MantissaBits, 0) as bigint) * $Ln2S)"

  /** DuckDB twins of [[keySparkSql]] / [[excessSparkSql]]. */
  def keyDuckSql(x: String): String =
    s"(CASE WHEN length(bin($x)) <= $MantissaBits THEN $x " +
      s"ELSE $x >> (length(bin($x)) - $MantissaBits) END)"

  def excessDuckSql(x: String): String =
    s"(greatest(length(bin($x)) - $MantissaBits, 0)::BIGINT * $Ln2S)"
}
