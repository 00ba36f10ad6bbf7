"""Structured-Streaming surfaces: micro-batch CDC driver, windowed
aggregation parity, stateful operators, the ``lake_cdf`` streaming +
batch change-feed DataSource (``from ..streaming.cdf_source import
LakeChangeFeedDataSource``), and the ``lake`` table SINK
(``from ..streaming.lake_sink import LakeTableSinkDataSource``) — both
imported lazily so environments without the PySpark 4 Python DataSource
API can still use the rest."""
