from picsure_dictionary_etl_spark.lake.table import LakeTable, Snapshot  # noqa: F401
from picsure_dictionary_etl_spark.lake.merge import merge_into, MergeResult  # noqa: F401
from picsure_dictionary_etl_spark.lake.consume import ChangeFeedConsumer  # noqa: F401
