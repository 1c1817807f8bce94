package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic rounding for DOUBLE outputs.
  *
  * The oracle engine (DuckDB) rounds doubles as `std::round(x * 10^p) / 10^p`
  * — i.e. it rounds the BINARY value after a double multiply, half away from
  * zero, and `std::round` preserves the sign of zero (`ROUND(-1e-9, 4)` is
  * `-0.0`). Spark's `round(x, p)` instead re-reads the SHORTEST DECIMAL
  * representation (`BigDecimal.valueOf`) and half-up-rounds that, always
  * emitting `+0.0`. The two disagree exactly on the knife edges that matter:
  *
  *  - a value whose ×10^p product lands on (or crosses, via the multiply's
  *    own rounding) a `.5` boundary — e.g. `2975.92/64 = 46.49875` rounds to
  *    `46.4988` under shortest-repr half-up but `46.4987` under
  *    `round(x*1e4)/1e4` (the driver-observed q48 divergence, VERDICT r01);
  *  - any tiny negative that rounds to zero (`-0.0` vs `0.0`, the q44/sf0.1
  *    class from round 1).
  *
  * [[dround]] reproduces DuckDB's algorithm with Spark primitives: the same
  * IEEE multiply, then `round(y, 0)` — at scale 0 shortest-repr half-up and
  * `std::round` agree on every finite double because the `.5` boundaries are
  * exactly representable — then the same IEEE divide, with the sign of an
  * all-zero result recovered from the input (`x * 0.0`). Validated bitwise
  * against DuckDB `ROUND(x, p)` on 1.28M randomized + adversarial cases for
  * p ∈ {2,3,4,6} (zero mismatches), including both round-1 knife edges.
  *
  * Every contract query's final rounded DOUBLE must go through this, so the
  * Spark side reproduces the DECLARED `ROUND(x, p)` oracle SQL bit-for-bit —
  * the twin is never edited to match the implementation (VERDICT r01 rule).
  */
object Rounding {

  /** DuckDB-exact `ROUND(x, p)` for DOUBLE columns. */
  def dround(c: Column, p: Int): Column = {
    val m = math.pow(10, p) // exact powers of ten up to 1e22
    val r = round(c * m, 0) / m
    // std::round keeps -0.0 for negative inputs rounding to zero; Spark's
    // BigDecimal path cannot. x * 0.0 restores IEEE sign-of-zero semantics.
    when(r === 0.0, c * lit(0.0)).otherwise(r)
  }
}
