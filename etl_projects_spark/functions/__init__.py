from etl_projects_spark.functions.names import format_column_name  # noqa: F401
