"""Dialect-paired vector expression builders (Spark SQL + DuckDB SQL).

Same pattern as functions.text_fns: one logical expression rendered per
engine so the DuckDB oracle can't drift from the Spark plan.

Numeric contract: every reduction is a SEQUENTIAL left-fold in DOUBLE
(Spark ``aggregate`` ≡ DuckDB ``list_reduce`` — DuckDB seeds with the
first element, Spark with 0.0, which is identical for ``+``).  Verified
bit-exact cross-engine on the testdata embeddings, so cosine similarities
compare EXACTLY — no rounding slop anywhere in the similarity stack.

Scale note: these are all JVM-side codegen'd expressions over
``array<float>`` columns — no Python UDFs.  For very high dimensions a
Pandas-UDF BLAS path could win, but at 64-d the expression form avoids
Arrow transfer entirely.
"""

from __future__ import annotations

import numpy as np

__all__ = ["VectorDialect", "VSPARK", "VDUCK", "random_hyperplanes"]


class VectorDialect:
    def __init__(self, name: str):
        assert name in ("spark", "duck")
        self.name = name

    def _sum(self, arr: str) -> str:
        """Sequential left-fold sum in DOUBLE over an array expression."""
        if self.name == "spark":
            return f"aggregate({arr}, CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        return f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {arr}), (acc, v) -> acc + v)"

    def _products(self, a: str, b: str) -> str:
        if self.name == "spark":
            return f"zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))"
        return (
            f"list_transform(range(1, len({a}) + 1), "
            f"i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE))"
        )

    def dot(self, a: str, b: str) -> str:
        if self.name == "duck":
            # Spark's aggregate(zip_with(NULL,...)) propagates NULL; DuckDB's
            # list_reduce(list_prepend(0.0, list_transform(range(1, len(NULL)+1),
            # ...))) collapses to 0.0 instead (found by dialect fuzzing) — guard
            # so a NULL vector yields NULL dot/norm/cosine on both engines.
            return (
                f"CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
                f"ELSE {self._sum(self._products(a, b))} END"
            )
        return self._sum(self._products(a, b))

    def norm(self, a: str) -> str:
        return f"sqrt({self.dot(a, a)})"

    def _sq_diffs(self, a: str, b: str) -> str:
        if self.name == "spark":
            return (
                f"zip_with({a}, {b}, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
                f" * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))"
            )
        t = f"(CAST(({a})[i] AS DOUBLE) - CAST(({b})[i] AS DOUBLE))"
        return f"list_transform(range(1, len({a}) + 1), i -> {t} * {t})"

    def sqdist(self, a: str, b: str) -> str:
        """Squared L2 distance — same sequential-fold bit-exactness
        contract as :meth:`dot` (each (x-y)² is two IEEE ops on identical
        inputs, the fold order is fixed), same NULL guard on DuckDB."""
        if self.name == "duck":
            return (
                f"CASE WHEN ({a}) IS NULL OR ({b}) IS NULL THEN NULL "
                f"ELSE {self._sum(self._sq_diffs(a, b))} END"
            )
        return self._sum(self._sq_diffs(a, b))

    def sqdist_fixed(self, a: str, b: str, dim: int) -> str:
        """Squared L2 over arrays of KNOWN length ``dim`` — on Spark the
        fold is unrolled into scalar arithmetic (element_at terms summed
        in the same ((0+t1)+t2)+… left-fold order), because the
        higher-order-function form is CodegenFallback: interpreted per
        row with a per-call array allocation — measured 4.3 s → 3.5 s on
        the PQ training chain at sf0.1, bit-identical codebooks.  Only
        sensible for SMALL dims (the PQ subvector width): at dim 64 the
        129-node unrolled tree measured 3× SLOWER than the HOF fold.
        DuckDB keeps the list fold (same fold order ⇒ same doubles)."""
        if self.name == "duck" or dim > 16:
            return self.sqdist(a, b)
        e = "CAST(0 AS DOUBLE)"
        for i in range(1, dim + 1):
            d = (f"(CAST(element_at({a}, {i}) AS DOUBLE)"
                 f" - CAST(element_at({b}, {i}) AS DOUBLE))")
            e = f"({e} + ({d} * {d}))"
        return e

    def slice(self, a: str, start: int, length: int) -> str:
        """1-based fixed-window subvector."""
        if self.name == "spark":
            return f"slice({a}, {start}, {length})"
        return f"list_slice({a}, {start}, {start + length - 1})"

    def cosine(self, a: str, b: str) -> str:
        # greatest(..., 1e-300) leaves every nonzero-norm result bit-exact
        # but keeps a zero vector from tripping Spark's ANSI DIVIDE_BY_ZERO
        # (cosine vs a zero vector becomes 0.0 on both engines).
        return f"({self.dot(a, b)} / greatest({self.norm(a)} * {self.norm(b)}, 1e-300))"

    def _lit_array(self, values) -> str:
        body = ", ".join(repr(float(v)) for v in values)
        if self.name == "spark":
            return f"array({body})"
        return f"[{body}]"

    def lsh_bucket(self, a: str, planes: np.ndarray) -> str:
        """Random-hyperplane (SimHash) bucket id: bit p set iff
        dot(a, plane_p) >= 0. Planes are literal constants so the
        expression is deterministic and oracle-expressible."""
        bits = []
        for p, plane in enumerate(planes):
            d = self.dot(a, self._lit_array(plane))
            bits.append(f"(CASE WHEN {d} >= 0 THEN {1 << p} ELSE 0 END)")
        return "(" + " + ".join(bits) + ")"


def random_hyperplanes(num_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplanes; rounded so their decimal repr is exact
    in both engines' literal parsers."""
    rng = np.random.RandomState(seed)
    return np.round(rng.randn(num_planes, dim), 6)


VSPARK = VectorDialect("spark")
VDUCK = VectorDialect("duck")
