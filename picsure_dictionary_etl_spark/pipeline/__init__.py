from picsure_dictionary_etl_spark.pipeline.dictionary import load_column_meta_dictionary  # noqa: F401
