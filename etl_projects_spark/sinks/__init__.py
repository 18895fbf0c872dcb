from etl_projects_spark.sinks.table_writer import TableWriter, write_gzip_jsonl  # noqa: F401
