"""Cross-engine determinism helpers (SURVEY.md §1.3 / §7 hard-part 1).

Distributed float aggregation is order-dependent, Spark timestamps are
µs while the events table is ns, and column naming must match the DuckDB
oracle exactly.  Every declared query funnels through these helpers so
the discipline lives in one place:

- ``money``  — cast to DECIMAL(18,2) *before* aggregating: decimal sums
  are exact and associative, so partitioned Spark sums equal DuckDB's
  serial sums bit-for-bit.
- ``r6``     — round float-derived scalars to 6 dp, collapsing low-order
  bit differences from summation order / float32 inputs.
- ``tus``    — exact µs-since-epoch from the lossless ns long using
  integer ``div`` (float division would corrupt ns epochs > 2^53).
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

__all__ = ["money", "r6", "tus", "disc_price", "DECIMAL_MONEY"]

DECIMAL_MONEY = "decimal(18,2)"


def money(col: Column | str) -> Column:
    """Exact money representation: DECIMAL(18,2) cast before any sum."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DECIMAL_MONEY)


def disc_price(
    price: Column | str = "l_extendedprice",
    discount: Column | str = "l_discount",
) -> Column:
    """TPC-H discounted price, entirely in DECIMAL arithmetic: cast
    each operand FIRST, then multiply — exact on both engines, so the
    distributed sum matches DuckDB digit-for-digit (casting the double
    PRODUCT instead rounds differently per engine).  One definition
    for every revenue query; the oracle SQL mirrors the same
    per-operand CAST pattern and must stay in lockstep with this
    expression."""
    return money(price) * (
        F.lit(1).cast(DECIMAL_MONEY) - money(discount)
    )


def r6(col: Column | str) -> Column:
    """Round a float-derived scalar to 6 decimal places (parity rule)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, 6)


def tus(ns_col: Column | str = "ts_ns") -> Column:
    """Microseconds since epoch from a ns-since-epoch long, exactly.

    Matches DuckDB ``epoch_us(ts)`` on the ns-resolution events table.
    Integer ``div`` is mandatory: `/` promotes to double and ns epochs
    (~1.7e18) exceed the 53-bit mantissa.
    """
    name = ns_col if isinstance(ns_col, str) else None
    if name is None:
        raise TypeError("tus() takes a column *name* (needs expr-level div)")
    return F.expr(f"{name} div 1000")
