"""Structured-Streaming surfaces: micro-batch CDC driver, windowed
aggregation parity, stateful operators, and the ``lake_cdf`` streaming
change-feed DataSource (``from ..streaming.cdf_source import
LakeChangeFeedDataSource``; imported lazily so environments without the
PySpark 4 Python DataSource API can still use the rest)."""
