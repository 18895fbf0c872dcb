"""etl_projects_spark — a PySpark-native analytics/ETL engine.

A from-scratch rebuild of the capabilities of the reference ETL
platform (``lsom11/etl-projects``), re-expressed Spark-first:

- ``session``      — SparkSession bootstrap (AQE on, tuned for local + cluster)
- ``config``       — lake layers + storage-format policy
- ``catalog``      — metastore naming + table registration
- ``engine``       — LakeEngine: sql(), load_table(), promote_to_dw()
- ``operators``    — fluent DataFrameOps + dedup / similarity / text / multimodal
- ``sources``      — ingest with declared schema + validation
- ``sinks``        — partitioned table writer (parquet / json / gzip-jsonl)
- ``quality``      — row validation + batch monitors
- ``streaming``    — structured-streaming event aggregation

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the observable behavior of the reference repo.
"""

from etl_projects_spark.session import build_session  # noqa: F401
from etl_projects_spark.config import Layer, StorageFormat, layer_storage_format  # noqa: F401
from etl_projects_spark.engine import LakeEngine  # noqa: F401

__version__ = "0.1.0"
