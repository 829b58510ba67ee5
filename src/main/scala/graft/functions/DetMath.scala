package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine transcendentals — the float analog of the
  * engine's exact-cents/md5-hash rules.
  *
  * Why: libm results differ across engines in the last ulp, so any
  * operator whose OUTPUT routes through `pow`/`log` cannot hash-gate
  * against the DuckDB oracle (measured on this container: the
  * native-histogram interpolation `lo·(hi/lo)^f` disagrees between
  * `StrictMath.pow` and DuckDB's `pow` on 76/4000 bucket-shaped inputs,
  * and even `pow(2, x)` — glibc's correctly-rounded path vs the HotSpot
  * intrinsic — on 94/100 000). The fix is the same one the engine
  * applies to sums (exact cents) and sketch hashes (md5 words): replace
  * the engine-private primitive with a FIXED ALGORITHM both engines can
  * evaluate identically. Every step below is a single IEEE
  * correctly-rounded operation (+, −, ×, ÷, floor) in a pinned order,
  * so any engine computing the same steps on the same doubles produces
  * the same bits.
  *
  * `exp2(x) = 2^x` via:
  *   s = x·32;  n = ⌊s⌋;  u = s − n ∈ [0,1)
  *   j = n mod 32;  e = (n − j)/32        (exact integer arithmetic)
  *   2^x = (2^e · T[j]) · P(u)
  * where `T[j] = 2^(j/32)` are 32 shared literals and `P(u) ≈ 2^(u/32)`
  * is the degree-6 Taylor polynomial of `exp(u·ln2/32)` with literal
  * coefficients, evaluated by Horner. `2^e` is exact in any IEEE `pow`
  * (integer exponent, representable result). Truncation error ≤
  * (ln2/32)^7/5040 ≈ 4·10⁻¹⁶ relative — sub-ulp; total error vs true
  * 2^x stays within a few ulp (spec-pinned ≤ 4 ulp against
  * `StrictMath.pow`), and integer `x` is EXACT (u = 0, P(0) = 1).
  *
  * Three mirrors of the same pinned step sequence: [[exp2]] (JVM
  * scalar, used by the native-histogram aggregator), [[exp2Col]]
  * (Spark Column, used by the PromQL front-end's native-histogram
  * path), and [[exp2Sql]] (DuckDB SQL, used by the oracles). The spec
  * pins exp2 ≡ exp2Col on a dense sweep; exp2 ≡ exp2Sql is pinned by
  * the driver's hash gate itself (b37/p69).
  */
object DetMath {

  /** Taylor coefficients of `exp(u · ln2/32)`, degree 6: `b_i =
    * (ln2/32)^i / i!`. Computed once and shipped to both engines as
    * literals (`Double.toString` round-trips exactly).
    */
  val Exp2Coeffs: Array[Double] = {
    val l = StrictMath.log(2.0) / 32.0
    val c = new Array[Double](7)
    c(0) = 1.0
    var i = 1
    var num = 1.0
    var fact = 1.0
    while (i < 7) { num *= l; fact *= i; c(i) = num / fact; i += 1 }
    c
  }

  /** `T[j] = 2^(j/32)`, j = 0..31 — shared literal table. */
  val Exp2Table: Array[Double] =
    Array.tabulate(32)(j => StrictMath.pow(2.0, j / 32.0))

  /** Reference implementation — the pinned step sequence. */
  def exp2(x: Double): Double = {
    val s = x * 32.0
    val nf = Math.floor(s)
    val u = s - nf
    val n = nf.toLong
    val j = Math.floorMod(n, 32L).toInt
    val e = (n - j) / 32L
    var p = Exp2Coeffs(6)
    var i = 5
    while (i >= 0) { p = p * u + Exp2Coeffs(i); i -= 1 }
    (Math.pow(2.0, e.toDouble) * Exp2Table(j)) * p
  }

  /** Spark Column mirror — identical step order; `floor` yields LONG,
    * `pmod` the non-negative residue, and the final product associates
    * left exactly like [[exp2]].
    */
  def exp2Col(x: Column): Column = {
    val s = x * lit(32.0)
    val n = floor(s)
    val u = s - n.cast("double")
    val j = pmod(n, lit(32L))
    val e = (n - j).cast("double") / lit(32.0)
    val p = (5 to 0 by -1).foldLeft(lit(Exp2Coeffs(6))) { (acc, i) =>
      acc * u + lit(Exp2Coeffs(i))
    }
    org.apache.spark.sql.functions.pow(lit(2.0), e) * element_at(
      array(Exp2Table.map(lit).toIndexedSeq: _*), (j + lit(1L)).cast("int")) * p
  }

  /** DuckDB SQL mirror over an expression string `x` (use a simple
    * column reference — the fragment repeats it). Literal doubles ride
    * as quoted strings: a bare decimal literal would parse as DECIMAL
    * and double-round.
    */
  def exp2Sql(x: String): String = {
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    val u = s"(($x * 32.0) - FLOOR($x * 32.0))"
    val nb = s"CAST(FLOOR($x * 32.0) AS BIGINT)"
    val j = s"((($nb % 32) + 32) % 32)"
    val e = s"(CAST($nb - $j AS DOUBLE) / 32.0)"
    val p = (5 to 0 by -1).foldLeft(d(Exp2Coeffs(6))) { (acc, i) =>
      s"($acc * $u + ${d(Exp2Coeffs(i))})"
    }
    val tbl = Exp2Table.map(d).mkString("[", ",", "]")
    s"((pow(2.0, $e) * ($tbl)[CAST($j AS INT) + 1]) * $p)"
  }

  // ---- log2 ---------------------------------------------------------

  /** `log2(x) = e + L[j] + P(r)` for x > 0, via:
    *   e = ⌊log2 x⌋ — libm gives the raw guess, comparison against the
    *       EXACT doubles 2^e corrects it (2^e is exactly representable
    *       for |e| < 1023, so containment `2^e ≤ x < 2^(e+1)` is an
    *       exact predicate — libm seeds, never decides);
    *   m = x / 2^e ∈ [1,2)         (power-of-two divide — exact)
    *   j = ⌊(m−1)·32⌋              (m−1 and ×32 both exact)
    *   L[j] = log2(1 + j/32)       (32 shared literals)
    *   r = m/(1 + j/32) − 1 ∈ [0, ~1/31)
    *   P(r) = (r − r²/2 + … + r⁷/7)/ln2 by Horner with literal
    *       coefficients — truncation < r⁸/8/ln2 ≈ 2·10⁻¹³
    * Every runtime step is one correctly-rounded IEEE op in pinned
    * order → bit-identical across engines. Absolute error ≤ ~1e-12
    * (relative error degrades toward x = 1 where log2 → 0 — use for
    * SCORES, not for seeding exp2 round-trips that must be exact).
    */
  val Log2Coeffs: Array[Double] = {
    val iln2 = 1.0 / StrictMath.log(2.0)
    Array.tabulate(8)(k => if (k == 0) 0.0
    else (if (k % 2 == 1) 1.0 else -1.0) / k * iln2)
  }

  /** `L[j] = log2(1 + j/32)`, j = 0..31 — shared literal table. */
  val Log2Table: Array[Double] =
    Array.tabulate(32)(j => StrictMath.log(1.0 + j / 32.0) / StrictMath.log(2.0))

  def log2(x: Double): Double = {
    // total: out-of-domain returns NaN (never throws) — codegen CSE may
    // hoist a det_log2 call out of its guarding CASE branch, so the
    // function must be safe to evaluate on any double
    if (!(x > 0.0) || x.isInfinite) return Double.NaN
    var e = Math.floor(StrictMath.log(x) / StrictMath.log(2.0)).toInt
    // exact-containment correction: 2^e <= x < 2^(e+1)
    if (x < Math.pow(2.0, e.toDouble)) e -= 1
    else if (x >= Math.pow(2.0, (e + 1).toDouble)) e += 1
    val m = x / Math.pow(2.0, e.toDouble)
    val j = Math.floor((m - 1.0) * 32.0).toInt
    val r = m / (1.0 + j / 32.0) - 1.0
    var p = Log2Coeffs(7)
    var k = 6
    while (k >= 1) { p = p * r + Log2Coeffs(k); k -= 1 }
    p = p * r
    (e.toDouble + Log2Table(j)) + p
  }

  /** Spark Column mirror of [[log2]] — same pinned step order. */
  def log2Col(x: Column): Column = {
    val raw = floor(org.apache.spark.sql.functions.log2(x)).cast("int")
    val e = when(x < org.apache.spark.sql.functions.pow(lit(2.0), raw.cast("double")), raw - 1)
      .when(x >= org.apache.spark.sql.functions.pow(lit(2.0), (raw + 1).cast("double")), raw + 1)
      .otherwise(raw)
    val m = x / org.apache.spark.sql.functions.pow(lit(2.0), e.cast("double"))
    val j = floor((m - lit(1.0)) * lit(32.0)).cast("int")
    val r = m / (lit(1.0) + j.cast("double") / lit(32.0)) - lit(1.0)
    val p0 = (6 to 1 by -1).foldLeft(lit(Log2Coeffs(7))) { (acc, k) =>
      acc * r + lit(Log2Coeffs(k))
    } * r
    (e.cast("double") + element_at(
      array(Log2Table.map(lit).toIndexedSeq: _*), j + lit(1))) + p0
  }

  /** DuckDB SQL mirror of [[log2]] over expression string `x`. */
  def log2Sql(x: String): String = {
    def d(v: Double): String = s"CAST('$v' AS DOUBLE)"
    val raw = s"CAST(FLOOR(log2($x)) AS INT)"
    val e = s"(CASE WHEN $x < pow(2.0, CAST($raw AS DOUBLE)) THEN $raw - 1 " +
      s"WHEN $x >= pow(2.0, CAST($raw + 1 AS DOUBLE)) THEN $raw + 1 " +
      s"ELSE $raw END)"
    val m = s"($x / pow(2.0, CAST($e AS DOUBLE)))"
    val j = s"CAST(FLOOR(($m - 1.0) * 32.0) AS INT)"
    val r = s"($m / (1.0 + CAST($j AS DOUBLE) / 32.0) - 1.0)"
    val p = (6 to 1 by -1).foldLeft(d(Log2Coeffs(7))) { (acc, k) =>
      s"($acc * $r + ${d(Log2Coeffs(k))})"
    } + s" * $r"
    val tbl = Log2Table.map(d).mkString("[", ",", "]")
    s"((CAST($e AS DOUBLE) + ($tbl)[$j + 1]) + ($p))"
  }

  // ---- sin / cos / atan ---------------------------------------------

  /** π to 60 digits (public mathematical constant) — the seed for the
    * Cody-Waite split below; only its double-rounded projections ever
    * reach runtime arithmetic.
    */
  private val PiBig = BigDecimal(
    "3.14159265358979323846264338327950288419716939937510582097494459")

  private def hi33(v: Double): Double = java.lang.Double.longBitsToDouble(
    java.lang.Double.doubleToLongBits(v) & 0xFFFFFFFFF8000000L)

  /** Cody-Waite 3-part split of π/2: C1 carries the top 33 significand
    * bits, C2 the next 33, C3 the remainder — `k·C1` and `k·C2` are
    * EXACT IEEE products for |k| < 2²⁰ (33 + 20 ≤ 53 bits), so the
    * reduced argument `r = ((x − k·C1) − k·C2) − k·C3` sees ~100 bits
    * of π/2. For |k| beyond that, products start rounding — the REDUCED
    * value drifts from true sin/cos, but every step is still one
    * correctly-rounded op in pinned order, so determinism never breaks
    * (only accuracy, spec-bounded over the fixture range |x| ≤ 500,
    * k ≤ 320).
    */
  val PiO2C1: Double = hi33((PiBig / 2).toDouble)
  val PiO2C2: Double = hi33(((PiBig / 2) - BigDecimal(PiO2C1)).toDouble)
  val PiO2C3: Double =
    ((PiBig / 2) - BigDecimal(PiO2C1) - BigDecimal(PiO2C2)).toDouble
  val TwoOverPi: Double = (BigDecimal(2) / PiBig).toDouble
  val HalfPi: Double = (PiBig / 2).toDouble
  val Pi: Double = PiBig.toDouble
  val DegPerRad: Double = (BigDecimal(180) / PiBig).toDouble
  val RadPerDeg: Double = (PiBig / BigDecimal(180)).toDouble

  /** Taylor coefficients: sin r = r·(1 + r²·(s₁ + r²·(s₂ + …))) with
    * sₙ = (−1)ⁿ/(2n+1)!; truncation after s₆ (r¹³ term) leaves
    * ≤ r¹⁵/15! ≈ 2·10⁻¹⁴ absolute at |r| ≤ π/4.
    */
  val SinCoeffs: Array[Double] = Array.tabulate(6) { i =>
    val n = i + 1
    var f = 1.0
    var k = 2
    while (k <= 2 * n + 1) { f *= k; k += 1 }
    (if (n % 2 == 1) -1.0 else 1.0) / f
  }

  /** cos r = 1 + r²·(c₁ + r²·(c₂ + …)) with cₙ = (−1)ⁿ/(2n)!;
    * truncation after c₇ (r¹⁴) leaves ≤ r¹⁶/16! ≈ 7·10⁻¹⁶.
    */
  val CosCoeffs: Array[Double] = Array.tabulate(7) { i =>
    val n = i + 1
    var f = 1.0
    var k = 2
    while (k <= 2 * n) { f *= k; k += 1 }
    (if (n % 2 == 1) -1.0 else 1.0) / f
  }

  /** The shared reduction: k = ⌊x·(2/π) + ½⌋, r as above, quadrant
    * q = k mod 4 computed in DOUBLE arithmetic (`kf − 4·⌊kf/4⌋`: the
    * ÷4 and ×4 are exact power-of-two scalings, the subtraction exact
    * by Sterbenz — no BIGINT cast, which DuckDB would range-check on
    * huge kf).
    */
  private def reduce(x: Double): (Double, Int) = {
    val kf = Math.floor(x * TwoOverPi + 0.5)
    val r = ((x - kf * PiO2C1) - kf * PiO2C2) - kf * PiO2C3
    val q = (kf - 4.0 * Math.floor(kf / 4.0)).toInt
    (r, q)
  }

  private def sinPoly(r: Double): Double = {
    val r2 = r * r
    var p = SinCoeffs(5)
    var i = 4
    while (i >= 0) { p = p * r2 + SinCoeffs(i); i -= 1 }
    r * (1.0 + r2 * p)
  }

  private def cosPoly(r: Double): Double = {
    val r2 = r * r
    var p = CosCoeffs(6)
    var i = 5
    while (i >= 0) { p = p * r2 + CosCoeffs(i); i -= 1 }
    1.0 + r2 * p
  }

  /** Domain bound of the Cody-Waite reduction (r10 ask #8): `k·C1` and
    * `k·C2` are exact IEEE products only while k's significand fits
    * 20 bits (33 + 20 ≤ 53), i.e. |k| ≤ 2²⁰ ⇔ |x| ≤ 2²⁰·π/2 ≈ 1.647e6.
    * Past it the reduction still runs the same correctly-rounded pinned
    * steps — deterministic — but the reduced argument silently drifts
    * from true sin/cos, so [[sin]]/[[cos]] FAIL LOUD instead of
    * returning a value whose accuracy quietly degraded; callers with
    * genuinely huge phases pre-reduce modulo 2π upstream (a
    * Payne-Hanek tier would lift the bound; not needed at ±500-range
    * fixtures and documented here so the gap is a named decision).
    */
  val SinCosDomainMax: Double = HalfPi * (1 << 20)

  private def checkSinCosDomain(x: Double): Unit =
    if (math.abs(x) > SinCosDomainMax)
      throw new IllegalArgumentException(
        s"det_sin/det_cos: |x| = ${math.abs(x)} exceeds the exact Cody-Waite " +
          s"reduction bound $SinCosDomainMax (2^20*pi/2); reduce the phase " +
          "modulo 2*pi before the deterministic trig tier")

  /** Deterministic sin — the pinned step sequence (quadrant dispatch
    * over the reduced argument). NaN for NaN/±Inf inputs; fails loud
    * past [[SinCosDomainMax]].
    */
  def sin(x: Double): Double = {
    if (x.isNaN || x.isInfinite) return Double.NaN
    checkSinCosDomain(x)
    val (r, q) = reduce(x)
    q match {
      case 0 => sinPoly(r)
      case 1 => cosPoly(r)
      case 2 => -sinPoly(r)
      case _ => -cosPoly(r)
    }
  }

  /** Deterministic cos — same reduction, shifted dispatch. */
  def cos(x: Double): Double = {
    if (x.isNaN || x.isInfinite) return Double.NaN
    checkSinCosDomain(x)
    val (r, q) = reduce(x)
    q match {
      case 0 => cosPoly(r)
      case 1 => -sinPoly(r)
      case 2 => -cosPoly(r)
      case _ => sinPoly(r)
    }
  }

  /** `AT[j] = atan(j/8)`, j = 0..8 — shared literal table. */
  val AtanTable: Array[Double] = Array.tabulate(9)(j => StrictMath.atan(j / 8.0))

  /** atan t = t·(1 + t²·(a₀ + t²·(a₁ + …))), aₖ = (−1)^(k+1)/(2k+3);
    * after the table reduction |t| ≤ 1/16, so truncation after the
    * t¹³ term leaves ≤ t¹⁵/15 ≈ 10⁻¹⁹.
    */
  val AtanCoeffs: Array[Double] = Array.tabulate(6) { k =>
    (if (k % 2 == 0) -1.0 else 1.0) / (2 * k + 3)
  }

  private def atanCore(t: Double): Double = {
    // t ∈ [0, 1]: j = ⌊t·8 + ½⌋ picks the nearest table point b = j/8,
    // rr = (t − b)/(1 + t·b) ∈ [−1/16, 1/16] the residual angle.
    val j = Math.floor(t * 8.0 + 0.5).toInt
    val b = j / 8.0
    val rr = (t - b) / (1.0 + t * b)
    val rr2 = rr * rr
    var p = AtanCoeffs(5)
    var i = 4
    while (i >= 0) { p = p * rr2 + AtanCoeffs(i); i -= 1 }
    AtanTable(j) + rr * (1.0 + rr2 * p)
  }

  /** Deterministic atan: |x| > 1 inverts through π/2 − atan(1/|x|)
    * (±Inf lands there naturally as atan(0)); the core runs ONCE on
    * the clamped t ∈ [0,1]; sign restored last. NOTE the 1/|x| divide
    * assumes x ≠ 0 on the inverted path only (|x| > 1), so zero input
    * is safe; DuckDB's NULL-on-divide-by-zero can never fire.
    */
  def atan(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    val a = Math.abs(x)
    val inv = a > 1.0
    val t = if (inv) 1.0 / a else a
    val at = atanCore(t)
    val v = if (inv) HalfPi - at else at
    if (x < 0.0) -v else v
  }

  // DuckDB SQL mirrors. sin/cos share the reduction, so the fragment
  // generators take the PRE-COMPUTED reduction columns (r, q) — callers
  // stage them in CTEs via [[trigReduceSql]] — while atan (applied to
  // different arguments per output column) is a self-contained fragment
  // like log2Sql.

  private def d(v: Double): String = s"CAST('$v' AS DOUBLE)"

  /** Column definitions for the reduction CTE: given expression `x`,
    * yields SQL for (kf, then from kf: r, q). Use as
    * `SELECT *, ${trigKfSql("x")} AS kf` then
    * `SELECT *, ${trigRSql("x", "kf")} AS r, ${trigQSql("kf")} AS q`.
    */
  def trigKfSql(x: String): String = s"FLOOR($x * ${d(TwoOverPi)} + 0.5)"

  def trigRSql(x: String, kf: String): String =
    s"((($x - $kf * ${d(PiO2C1)}) - $kf * ${d(PiO2C2)}) - $kf * ${d(PiO2C3)})"

  def trigQSql(kf: String): String =
    s"CAST($kf - 4.0 * FLOOR($kf / 4.0) AS INT)"

  /** sin-polynomial over a reduced-argument column `r`. */
  def sinPolySql(r: String): String = {
    val r2 = s"($r * $r)"
    val p = (4 to 0 by -1).foldLeft(d(SinCoeffs(5))) { (acc, i) =>
      s"($acc * $r2 + ${d(SinCoeffs(i))})"
    }
    s"($r * (1.0 + $r2 * $p))"
  }

  /** cos-polynomial over a reduced-argument column `r`. */
  def cosPolySql(r: String): String = {
    val r2 = s"($r * $r)"
    val p = (5 to 0 by -1).foldLeft(d(CosCoeffs(6))) { (acc, i) =>
      s"($acc * $r2 + ${d(CosCoeffs(i))})"
    }
    s"(1.0 + $r2 * $p)"
  }

  /** Quadrant dispatch over pre-computed columns (sp = sinPoly(r),
    * cp = cosPoly(r), q).
    */
  def sinDispatchSql(sp: String, cp: String, q: String): String =
    s"""(CASE $q WHEN 0 THEN $sp WHEN 1 THEN $cp
       | WHEN 2 THEN -$sp ELSE -$cp END)""".stripMargin.replace("\n", "")

  def cosDispatchSql(sp: String, cp: String, q: String): String =
    s"""(CASE $q WHEN 0 THEN $cp WHEN 1 THEN -$sp
       | WHEN 2 THEN -$cp ELSE $sp END)""".stripMargin.replace("\n", "")

  /** DuckDB SQL mirror of [[atan]] over expression string `x` (use a
    * simple column reference — the fragment repeats it). Same
    * structure as the scalar: one core evaluation over the clamped
    * t ∈ [0,1], inversion and sign dispatched around it.
    */
  def atanSql(x: String): String = {
    val a = s"ABS($x)"
    val t = s"(CASE WHEN $a > 1.0 THEN 1.0 / $a ELSE $a END)"
    val j = s"CAST(FLOOR($t * 8.0 + 0.5) AS INT)"
    val b = s"(CAST($j AS DOUBLE) / 8.0)"
    val rr = s"(($t - $b) / (1.0 + $t * $b))"
    val rr2 = s"($rr * $rr)"
    val p = (4 to 0 by -1).foldLeft(d(AtanCoeffs(5))) { (acc, i) =>
      s"($acc * $rr2 + ${d(AtanCoeffs(i))})"
    }
    val tbl = AtanTable.map(d).mkString("[", ",", "]")
    val at = s"(($tbl)[$j + 1] + $rr * (1.0 + $rr2 * $p))"
    val v = s"(CASE WHEN $a > 1.0 THEN ${d(HalfPi)} - $at ELSE $at END)"
    s"(CASE WHEN $x < 0.0 THEN -$v ELSE $v END)"
  }

  // ---- pow / atan2 (the libm binary-op bucket) ----------------------

  /** Deterministic `l^r` with PromQL `^` semantics: positive base via
    * `2^(r·log2 l)`; zero base exact (`0^r` is 0/1/+Inf — exact in any
    * IEEE pow, mirrored literally); negative base defined only at
    * integer exponents (sign = parity of r, magnitude through |l|),
    * NaN otherwise — upstream pow's dispatch, each branch a pinned
    * correctly-rounded sequence.
    */
  def pow(l: Double, r: Double): Double =
    if (l.isNaN || r.isNaN) Double.NaN
    else if (l > 0.0) exp2(r * log2(l))
    else if (l == 0.0) Math.pow(0.0, r)
    else if (r % 1.0 == 0.0) { // finite integer exponent (Inf%1 = NaN)
      val mag = exp2(r * log2(-l))
      if (r % 2.0 == 0.0) mag else -mag
    } else Double.NaN

  /** Deterministic quadrant-dispatched atan2 over [[atan]]. */
  def atan2(y: Double, x: Double): Double =
    if (y.isNaN || x.isNaN) Double.NaN
    else if (x > 0.0) atan(y / x)
    else if (x < 0.0) { if (y >= 0.0) atan(y / x) + Pi else atan(y / x) - Pi }
    else if (y > 0.0) HalfPi
    else if (y < 0.0) -HalfPi
    else 0.0

  /** DuckDB SQL mirror of [[pow]]. DuckDB raises on `log2` of a
    * negative/zero argument even when a CASE later discards the branch
    * (the b38 lesson), so the caller must pre-stage DOMAIN-GUARDED
    * columns: `lPos = CASE WHEN l > 0 THEN l END` and
    * `lNegAbs = CASE WHEN l < 0 THEN -l END` (NULL outside — NULL
    * propagates silently through the fragment and the CASE picks the
    * live branch).
    */
  def powSql(l: String, lPos: String, lNegAbs: String, r: String): String = {
    val posMag = exp2Sql(s"($r * ${log2Sql(lPos)})")
    val negMag = exp2Sql(s"($r * ${log2Sql(lNegAbs)})")
    // NaN guard first: DuckDB totally orders NaN ABOVE all doubles, so
    // `NaN > 0` is true there but false in the JVM — dispatch must not
    // reach a comparison with a NaN operand
    s"""(CASE WHEN isnan($l) OR isnan($r) THEN CAST('nan' AS DOUBLE)
       |      WHEN $l > 0.0 THEN $posMag
       |      WHEN $l = 0.0 THEN pow(0.0, $r)
       |      WHEN ($r % 1.0) = 0.0 THEN
       |        (CASE WHEN ($r % 2.0) = 0.0 THEN $negMag ELSE -$negMag END)
       |      ELSE CAST('nan' AS DOUBLE) END)""".stripMargin.replace("\n", " ")
  }

  /** DuckDB SQL mirror of [[atan2]] (same NaN-first dispatch rule as
    * [[powSql]]; the x = 0 division inside discarded branches yields
    * NULL in DuckDB, never an error).
    */
  def atan2Sql(y: String, x: String): String = {
    val q = atanSql(s"($y / $x)")
    s"""(CASE WHEN isnan($y) OR isnan($x) THEN CAST('nan' AS DOUBLE)
       |      WHEN $x > 0.0 THEN $q
       |      WHEN $x < 0.0 AND $y >= 0.0 THEN $q + ${d(Pi)}
       |      WHEN $x < 0.0 THEN $q - ${d(Pi)}
       |      WHEN $y > 0.0 THEN ${d(HalfPi)}
       |      WHEN $y < 0.0 THEN -${d(HalfPi)}
       |      ELSE 0.0 END)""".stripMargin.replace("\n", " ")
  }
}
