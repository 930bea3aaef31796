package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Complex-number type surface (reference
  * `src/backend/utils/adt/complex_type.c` — a Greengage-specific builtin
  * type with ~40 functions/operators, catalogued in `pg_type.h` as
  * `complex`). Modeled per SURVEY §1.2 as `struct<re:double, im:double>`
  * columns; every operation below is a plain Catalyst column expression
  * (whole-stage codegen, no UDF).
  *
  * Overflow policy: the reference's CHECKFLOATVAL raises on isinf results;
  * we keep IEEE semantics (Spark/DuckDB agree), which only diverges where
  * the reference would error out rather than return a value.
  */
object ComplexType {

  /** `complex(re, im)` constructor (complex_in's canonical re/im form). */
  def cplx(re: Column, im: Column): Column =
    struct(re.cast("double").as("re"), im.cast("double").as("im"))

  /** `re(z)` (complex_re). */
  def re(z: Column): Column = z.getField("re")

  /** `im(z)` (complex_im). */
  def im(z: Column): Column = z.getField("im")

  /** `conj(z)` (complex_conj). */
  def conj(z: Column): Column = cplx(re(z), -im(z))

  /** Unary minus (complex_um). */
  def neg(z: Column): Column = cplx(-re(z), -im(z))

  /** `a + b` (complex_pl). */
  def add(a: Column, b: Column): Column = cplx(re(a) + re(b), im(a) + im(b))

  /** `a - b` (complex_mi). */
  def sub(a: Column, b: Column): Column = cplx(re(a) - re(b), im(a) - im(b))

  /** `a * b` (complex_mul): (ac - bd, ad + bc). */
  def mul(a: Column, b: Column): Column = cplx(
    re(a) * re(b) - im(a) * im(b),
    re(a) * im(b) + im(a) * re(b))

  /** `a / b` (complex_div): multiply by the conjugate over |b|², the
    * reference's exact expression shape (complex_type.c complex_div —
    * a textbook formula, not Smith's scaled variant). Division by the
    * zero complex yields IEEE inf/nan where the reference errors. */
  def div(a: Column, b: Column): Column = {
    val d = re(b) * re(b) + im(b) * im(b)
    cplx(
      (re(a) * re(b) + im(a) * im(b)) / d,
      (im(a) * re(b) - re(a) * im(b)) / d)
  }

  /** `|z|` magnitude (complex_mag). The reference calls C hypot(); we use
    * the sqrt form, which is bit-identical to the DuckDB oracle's spelling
    * and differs from hypot only near DBL_MAX overflow — where the
    * reference raises CHECKFLOATVAL instead of returning. [[magHypot]]
    * keeps the overflow-safe variant for API users. */
  def mag(z: Column): Column = sqrt(re(z) * re(z) + im(z) * im(z))

  /** Overflow-safe magnitude via hypot (matches C hypot at the edges). */
  def magHypot(z: Column): Column = hypot(re(z), im(z))

  /** `arg(z)` phase angle (complex_arg = atan2(im, re)). libm vs JVM
    * atan2 can differ in the last ulp → pinned by tolerance tests, kept
    * out of hash-gated catalog columns. */
  def arg(z: Column): Column = atan2(im(z), re(z))

  /** `exp(z)` (complex_exp): e^re · (cos im, sin im). */
  def cexp(z: Column): Column = {
    val r = exp(re(z))
    cplx(r * cos(im(z)), r * sin(im(z)))
  }

  /** `ln(z)` principal branch (complex_ln): (ln |z|, arg z). */
  def cln(z: Column): Column = cplx(log(magHypot(z)), arg(z))

  /** `sqrt(z)` principal root (complex_sqrt): √|z| · (cos θ/2, sin θ/2). */
  def csqrt(z: Column): Column = {
    val r = sqrt(magHypot(z))
    val t = arg(z) / 2.0d
    cplx(r * cos(t), r * sin(t))
  }

  /** `a = b` (complex_eq; complex_cmp orders by (re, im) — struct
    * comparison gives the same order for free). */
  def ceq(a: Column, b: Column): Column = re(a) === re(b) && im(a) === im(b)

  /** `dot_product(complex[], complex[])` (complex_dot_product):
    * Σᵢ a[i]·b[i] under complex multiplication, over two equal-length
    * 1-D arrays. Same-length is the caller's contract (the reference
    * errors on mismatch); zip_with stops at the shorter side with nulls,
    * surfacing a null result rather than a wrong one. */
  def dotProduct(a: Column, b: Column): Column = {
    val prods = zip_with(a, b, (x, y) => mul(x, y))
    aggregate(prods, cplx(lit(0.0d), lit(0.0d)), (acc, p) => add(acc, p))
  }
}
