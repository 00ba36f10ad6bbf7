from picsure_dictionary_etl_spark.cdc.envelope import (  # noqa: F401
    TRANSCRIPT_FIELDS,
    TRANSCRIPT_KEY,
    change_event_schema,
    transcript_table_schema,
)
from picsure_dictionary_etl_spark.cdc.runner import CdcRunner, RunnerConfig  # noqa: F401
