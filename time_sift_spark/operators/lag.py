"""Public lag/lead feature operators (reference O1-O4 analogues).

The reference exposes ``lag_matrix`` / ``lag_matrix_2d`` free functions plus
a ``CreateLagMatrix`` method-call trait (/root/reference/src/lib.rs:258-440)
— all pure delegation to one kernel.  Our analogue: ``lag_features`` (the
one entry point, delegating to plans.lag_plan.build_lag_plan) plus a
``with_lags`` curried form for ``df.transform(...)`` pipelines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..errors import InvalidLagsError
from ..plans.lag_plan import build_lag_plan

__all__ = ["lag_features", "lead_features", "with_lags", "lag_shape"]


def lag_features(
    df: DataFrame,
    value_cols: str | Sequence[str],
    time_col: str,
    lags,
    *,
    partition_by: str | Sequence[str] | None = None,
    order_extra: str | Sequence[str] | None = None,
    fill=None,
    layout: str = "wide",
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Append time-lagged copies of ``value_cols`` to ``df``.

    Wide layout ≅ reference ColumnMajor output (src/lib.rs:724-754); long
    layout ≅ RowMajor output (src/lib.rs:693-723).  See
    plans.lag_plan.build_lag_plan for the full semantics contract.
    """
    return build_lag_plan(
        df,
        value_cols,
        time_col,
        lags,
        partition_by=partition_by,
        order_extra=order_extra,
        fill=fill,
        layout=layout,
        keep_cols=keep_cols,
    )


def lead_features(
    df: DataFrame,
    value_cols: str | Sequence[str],
    time_col: str,
    leads,
    *,
    partition_by: str | Sequence[str] | None = None,
    order_extra: str | Sequence[str] | None = None,
    fill=None,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Forward shifts (no reference counterpart — lags only there).

    Implemented by reusing the lag plan over a descending time ordering is
    wrong for ties, so we use the direct form: ``LEAD(v, k)`` shares the
    same single window spec.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..errors import validate_lags
    from ..plans.lag_plan import _as_list

    value_list = _as_list(value_cols)
    lead_list = validate_lags(leads)
    parts = _as_list(partition_by)
    extra = _as_list(order_extra)
    order_by = [time_col, *extra]
    w = (
        Window.partitionBy(*parts).orderBy(*order_by)
        if parts
        else Window.orderBy(*order_by)
    )
    keep = list(keep_cols) if keep_cols is not None else [*parts, time_col, *extra]
    exprs = []
    seen: set[tuple[str, int]] = set()
    for pos, k in enumerate(lead_list):
        for v in value_list:
            name = f"{v}_lead{k}" if (v, k) not in seen else f"{v}_lead{k}_p{pos}"
            seen.add((v, k))
            e = F.lead(F.col(v), k).over(w) if k else F.col(v)
            if fill is not None and k:
                e = F.coalesce(e, F.lit(fill))
            exprs.append(e.alias(name))
    return df.select(*keep, *exprs)


def with_lags(value_cols, time_col, lags, **kwargs):
    """Curried form for ``df.transform(with_lags(...))`` pipelines.

    Analogue of the reference's method-call sugar trait ``CreateLagMatrix``
    (src/lib.rs:258-440): zero added logic, pure delegation.
    """

    def _apply(df: DataFrame) -> DataFrame:
        return lag_features(df, value_cols, time_col, lags, **kwargs)

    return _apply


def lag_shape(df: DataFrame) -> dict:
    """Shape introspection ≅ the reference ``LagMatrix`` accessors
    (src/lib.rs:148-218): num_cols from the schema, lag column inventory
    from the naming convention. Row counts are data-dependent in a lazy
    engine, so ``num_rows`` is intentionally absent (call ``df.count()``).
    """
    import re

    lag_cols = [c for c in df.columns if re.search(r"_lag\d+(_p\d+)?$", c)]
    lags = sorted({int(m.group(1)) for c in lag_cols if (m := re.search(r"_lag(\d+)", c))})
    return {
        "num_cols": len(df.columns),
        "columns": list(df.columns),
        "lag_columns": lag_cols,
        "lags_present": lags,
        "is_long": {"lag_pos", "lag"} <= set(df.columns),
    }
