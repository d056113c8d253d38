"""Cross-engine deterministic numeric conversion helpers (SQL text).

Two conversion hazards found by tests/test_dialect_fuzz.py round-6
templates — both are silent last-digit divergences between Spark and
DuckDB, i.e. exactly the class that fails a driver value-hash:

1. DECIMAL→DOUBLE of a wide decimal. DuckDB converts the int128
   representation to double and THEN divides by 10^scale — two
   roundings; Spark (BigDecimal.doubleValue) correctly rounds once.
   They differ as soon as the internal integer exceeds 2^53 (observed:
   20152415783.501905210200 → Spark ...904 / DuckDB ...907).
   :func:`dec_to_double` splits the value into integral and fractional
   parts, each with an exactly-convertible representation, and adds
   them — one shared IEEE add, bit-identical on both engines.

2. DOUBLE→DECIMAL at an exact representable tie. Spark rounds HALF_UP,
   DuckDB HALF_EVEN (CAST(0.0078125 AS DECIMAL(_,6)) → 0.007813 vs
   0.007812).  :func:`round_double` rounds in pure double arithmetic
   (scale, add 0.5, floor, unscale) — whatever it does at a boundary,
   BOTH engines do the same thing, which is the property that matters.
"""

from __future__ import annotations

__all__ = ["dec_to_double", "round_double"]


def dec_to_double(d: str) -> str:
    """Deterministic DECIMAL→DOUBLE for decimals of any width.

    ``d - (d % 1)`` is integral (exact decimal ops), re-scaled to a
    scale-0 decimal (exact: the value is integral) whose int64/int128
    rep equals its value — both engines convert integers < 2^53
    exactly.  ``d % 1`` has magnitude < 1, so its scaled rep is at most
    10^scale < 2^53 for scale ≤ 12 — both engines convert it with one
    correct rounding.  The final add is one IEEE op on identical
    inputs.  (Integral parts beyond 2^53 lose exactness as any double
    must, but the two engines still agree — the conversion of the
    scale-0 decimal is a SINGLE rounding on both.)
    """
    return (
        f"(CAST(CAST((({d}) - (({d}) % 1)) AS DECIMAL(26,0)) AS DOUBLE)"
        f" + CAST((({d}) % 1) AS DOUBLE))"
    )


def round_double(e: str, nd: int, *, guard: float = 1e9) -> str:
    """Round a DOUBLE to ``nd`` decimals identically on both engines.

    Pure double arithmetic — no decimal cast, so no tie-mode mismatch.
    Spark's FLOOR(double) returns BIGINT, which saturates past 2^63:
    magnitudes ≥ ``guard`` are returned unrounded (at 1e9 a 4-decimal
    round is below the double's own ulp anyway).
    """
    scale = 10 ** nd
    mag = f"(CAST(FLOOR(ABS({e}) * {scale}.0 + 0.5) AS DOUBLE) / {scale}.0)"
    return (
        f"(CASE WHEN ABS({e}) >= {guard} THEN ({e}) "
        f"WHEN ({e}) < 0.0 THEN -{mag} ELSE {mag} END)"
    )
