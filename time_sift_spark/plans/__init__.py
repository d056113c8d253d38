from .lag_plan import build_lag_plan, lag_column_names  # noqa: F401
