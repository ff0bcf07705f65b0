package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-integer money arithmetic — the repo's FP-parity doctrine applied
  * to every `sum(money)` that crosses the oracle hash gate.
  *
  * Why: `round(sum(DOUBLE), k)` is only PROBABILISTICALLY portable across
  * engines. A double sum's value depends on summation order; at sf1 a
  * 5-group revenue sum reaches ~6×10¹⁰ where the accumulated residue
  * (~13 ulp ≈ 1e-4) crosses the 4-dp rounding half-grid, and Spark and
  * DuckDB land on ADJACENT grid points (q_salted_join failed exactly this
  * way at the round-9 sf1 gate). The fix is to sum in exact integer units
  * — order-free by associativity of integer addition — and perform ONE
  * deterministic float op (a division by a power of ten) at the very end:
  *   - long → double conversion is round-to-nearest-even in both the JVM
  *     and C++ (identical at ANY magnitude, even past 2^53), and
  *   - IEEE division is correctly rounded,
  * so both engines produce the bit-identical double from the same integer.
  *
  * Domain: every money/value column in the testdata sits exactly on the
  * 2-dp grid (verified: l_extendedprice, l_discount, l_tax, o_totalprice,
  * c_acctbal, events.value — 0 off-grid rows), so `round(x*100)` recovers
  * the exact integer cents (x*100 lands within 1 ulp of the integer —
  * never at a .5 tie, so HALF_UP vs half-away rounding can't differ).
  *
  * Units: cents (1e-2 dollars) for plain sums; "cent-percent" (1e-4
  * dollars) for discounted revenue — cents × (100 − disc_pct) is exact in
  * BIGINT. Overflow headroom: ~1e9 units/row × 6e6 rows (sf1) ≈ 6e15,
  * ANSI sum(long) fails loudly long before 2^63.
  */
object Money {
  /** Exact integer cents of a 2-dp-grid double (also: integer percent of
    * a 2-dp-grid fraction such as l_discount / l_tax).
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Order-free dollar sum of a 2-dp column: exact cents sum, one final
    * division.
    */
  def sumDollars(c: Column): Column = sum(cents(c)) / 100.0

  /** Discounted revenue per row in exact 1e-4-dollar units:
    * price_cents × (100 − discount_pct).
    */
  def revenueUnits(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** Order-free `sum(price * (1 - discount))` as dollars (4-dp exact). */
  def sumRevenue(price: Column, discount: Column): Column =
    sum(revenueUnits(price, discount)) / 10000.0

  // ---- DuckDB-oracle SQL fragments (ANSI; the CAST around sum() pins
  // ---- DuckDB's HUGEINT widening back to the BIGINT Spark compares).

  /** SQL twin of [[cents]]. */
  def sqlCents(c: String): String = s"CAST(round(($c) * 100) AS BIGINT)"

  /** SQL twin of [[sumDollars]]. */
  def sqlSumDollars(c: String): String =
    s"CAST(sum(${sqlCents(c)}) AS BIGINT) / 100.0"

  /** SQL twin of [[revenueUnits]]. */
  def sqlRevenueUnits(price: String, discount: String): String =
    s"${sqlCents(price)} * (100 - ${sqlCents(discount)})"

  /** SQL twin of [[sumRevenue]]. */
  def sqlSumRevenue(price: String, discount: String): String =
    s"CAST(sum(${sqlRevenueUnits(price, discount)}) AS BIGINT) / 10000.0"
}
