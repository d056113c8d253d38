"""time_sift_spark — a PySpark-native analytics engine.

Core capability: time-lagged design-matrix ("lag feature") generation over
arbitrarily many, arbitrarily long time series — the distributed,
schema-ful, null-aware generalization of the Snojj25/time-sift Rust crate
(reference read-only at /root/reference; surface = ``lag_matrix`` /
``lag_matrix_2d``, /root/reference/src/lib.rs:487-538 and :660-756).

Extensions (project charter): rolling features, sessionization, as-of
joins, resampling, dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding), similarity search, text analysis, multimodal column plumbing,
streaming lag.
"""

from .errors import (  # noqa: F401
    ColumnNotFoundError,
    EmptyDataError,
    InvalidLagsError,
    InvalidLengthError,
    InvalidMemoryLayoutError,
    InvalidStrideError,
    LagError,
    LagExceedsValueCountError,
)
from .operators.lag import lag_features, lag_shape, lead_features, with_lags  # noqa: F401
from .session import get_spark  # noqa: F401

__version__ = "0.1.0"
