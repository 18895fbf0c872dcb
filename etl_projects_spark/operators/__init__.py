from etl_projects_spark.operators.dataframe_ops import DataFrameOps  # noqa: F401
