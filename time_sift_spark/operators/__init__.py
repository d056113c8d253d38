from .lag import lag_features, lag_shape, lead_features, with_lags  # noqa: F401
