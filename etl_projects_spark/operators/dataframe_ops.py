"""Fluent DataFrame-transformation service (operators P1–P10, X1–X2).

API-parity re-expression of the reference's
``SparkDataFrameService`` (``etl_projects/base/processors/spark/
spark_dataframe_service.py:10-218``), with the Spark-first upgrades
called out in SURVEY §2.3/§4:

- rename-all is one ``toDF`` plan node, not N ``withColumnRenamed`` (P3);
- JSON explode uses sampled schema inference + ``from_json`` +
  ``select("s.*")`` instead of an RDD round-trip + temp table +
  ``json_tuple`` (P7) — no hidden eager job over the full column;
- count-based repartition is retained for explicit file-count control
  but documented as subsumed by AQE (X1).

Usage::

    out = (DataFrameOps(df)
           .explode_json_column("props", prefix="p_")
           .create_year_month_day_columns_from_dataframe_column("ts")
           .output())
"""

from __future__ import annotations

from collections.abc import Mapping
from datetime import date, datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from etl_projects_spark.functions.names import format_column_name

# Bounded driver-side sample used only for key-TYPE inference; the key
# UNION itself is computed distributed (json_object_keys), so growing
# the corpus never grows driver memory.
JSON_TYPE_SAMPLE_ROWS = 1024


def _infer_json_schema(
    df: DataFrame, json_column: str, sample_ratio: float = 1.0
) -> StructType:
    """Union-of-all-keys schema for a JSON-string column, JVM-side.

    Two bounded jobs, zero Python stages over the data:

    1. key union — ``explode(json_object_keys(col))`` + distinct: a
       narrow codegen scan and one shuffle whose rows are key *names*
       (schema-sized, like ``df.columns`` — safe to collect);
    2. key types — ``spark.read.json`` over at most
       ``JSON_TYPE_SAMPLE_ROWS`` strings parallelized from the driver;
       keys that never appear in the sample type as string.

    This replaces the previous ``sample.rdd.map(...)`` inference, which
    pushed the whole column through Python workers.
    """
    js = F.coalesce(F.col(json_column), F.lit("{}"))
    keys = sorted(
        r[0]
        for r in df.select(F.explode(F.json_object_keys(js)).alias("k"))
        .distinct()
        .collect()
    )
    sample = df.select(js.alias("j"))
    if sample_ratio < 1.0:
        sample = sample.sample(fraction=sample_ratio, seed=42)
    strings = [r[0] for r in sample.limit(JSON_TYPE_SAMPLE_ROWS).collect()]
    spark = df.sparkSession
    inferred = spark.read.json(
        spark.sparkContext.parallelize(strings or ["{}"], numSlices=1)
    ).schema
    by_name = {f.name: f for f in inferred.fields}
    return StructType(
        [
            StructField(k, by_name[k].dataType, True)
            if k in by_name
            else StructField(k, StringType(), True)
            for k in keys
        ]
    )


class DataFrameOps:
    """Immutable fluent wrapper: every op returns a new ``DataFrameOps``."""

    def __init__(self, df: DataFrame):
        self.df = df

    # ---- P1: pipeline wrapper ----------------------------------------------

    @classmethod
    def input(cls, df: DataFrame) -> "DataFrameOps":
        return cls(df)

    def output(self) -> DataFrame:
        return self.df

    # ---- P2/P3: column-name normalization ----------------------------------

    @staticmethod
    def format_column_name(column_name: str) -> str:
        return format_column_name(column_name)

    def format_column_names(self) -> "DataFrameOps":
        """Snake-case every column — single ``toDF`` plan node (P3).

        Fails FAST on a normalization collision ('Net Chg' and
        'net.chg' both → 'net_chg') or an emptied name ('%' → ''):
        either would otherwise surface far downstream as an
        ambiguous-reference or invalid-column error with no hint of
        the cause."""
        renamed = [format_column_name(c) for c in self.df.columns]
        empties = [o for o, n in zip(self.df.columns, renamed) if not n]
        if empties:
            raise ValueError(
                f"column names normalize to empty: {empties!r}"
            )
        dupes = {n for n in renamed if renamed.count(n) > 1}
        if dupes:
            clashes = {
                n: [o for o, r in zip(self.df.columns, renamed) if r == n]
                for n in dupes
            }
            raise ValueError(
                f"column names collide after normalization: {clashes!r}"
            )
        return DataFrameOps(self.df.toDF(*renamed))

    # ---- P4–P6: complex-type casts -----------------------------------------

    def _cols_of_type(self, spark_type) -> list[str]:
        return [f.name for f in self.df.schema.fields if isinstance(f.dataType, spark_type)]

    def convert_struct_type_to_json(self) -> "DataFrameOps":
        """Every StructType column → JSON string (P4)."""
        cols = self._cols_of_type(StructType)
        return DataFrameOps(self.df.withColumns({c: F.to_json(F.col(c)) for c in cols}))

    def convert_array_type_to_json(self) -> "DataFrameOps":
        """Every ArrayType column → JSON string (P5)."""
        cols = self._cols_of_type(ArrayType)
        return DataFrameOps(self.df.withColumns({c: F.to_json(F.col(c)) for c in cols}))

    def convert_struct_type_to_string(self) -> "DataFrameOps":
        """Every StructType column → ``cast('string')`` (P6)."""
        cols = self._cols_of_type(StructType)
        return DataFrameOps(
            self.df.withColumns({c: F.col(c).cast("string") for c in cols})
        )

    # ---- P7: JSON explode ---------------------------------------------------

    def explode_json_column(
        self,
        json_column: str,
        prefix: str = "",
        format_column_names: bool = False,
        sample_ratio: float = 1.0,
        schema: StructType | str | None = None,
    ) -> "DataFrameOps":
        """Flatten a JSON-string column into one top-level column per key (P7).

        Matches the reference's union-of-all-keys semantics
        (``spark_dataframe_service.py:111-146``) without its full-column
        RDD scan: the key UNION comes from a JVM-side
        ``json_object_keys`` distinct (narrow scan + one key-name-sized
        shuffle — zero Python stages over the data), key TYPES from
        ``spark.read.json`` over a bounded driver-parallelized string
        sample (keys outside the sample fall back to string). Pass an
        explicit ``schema`` for a zero-inference-job plan — the right
        call at 100 TB.
        """
        df = self.df
        if schema is None:
            schema = _infer_json_schema(df, json_column, sample_ratio)
        parsed = df.withColumn("__parsed__", F.from_json(F.col(json_column), schema))
        field_names = [f.name for f in parsed.schema["__parsed__"].dataType.fields]
        out_names = {
            f: (prefix + (format_column_name(f) if format_column_names else f))
            for f in field_names
        }
        keep = [c for c in df.columns if c != json_column]
        # A JSON key that (after prefix/formatting) collides with a
        # kept top-level column would silently produce a duplicate
        # column name — every later reference then fails with an
        # ambiguous-column error far from the cause. Fail here, where
        # the fix (a prefix) is obvious.
        clashes = sorted(set(out_names.values()) & set(keep))
        if clashes:
            raise ValueError(
                "explode_json_column: JSON keys collide with existing "
                f"columns {clashes}; pass a prefix to disambiguate"
            )
        # ...and keys colliding with EACH OTHER after formatting
        # ('Net Chg' and 'net.chg' both → 'net_chg') — a set-vs-set
        # check can't see those because values() dedups.
        names = list(out_names.values())
        self_clash = {
            n: [f for f, o in out_names.items() if o == n]
            for n in names
            if names.count(n) > 1
        }
        if self_clash:
            raise ValueError(
                "explode_json_column: JSON keys collide with each other "
                f"after formatting: {self_clash!r}"
            )
        out = parsed.select(
            *keep, *[F.col(f"__parsed__.`{f}`").alias(out_names[f]) for f in field_names]
        )
        return DataFrameOps(out)

    # ---- P8: literal columns ------------------------------------------------

    def create_columns_from_dict(self, columns: Mapping[str, object]) -> "DataFrameOps":
        """Add ``lit(value)`` columns from a mapping (P8)."""
        return DataFrameOps(
            self.df.withColumns({k: F.lit(v) for k, v in columns.items()})
        )

    # ---- P9/P10: date-part derivation --------------------------------------

    def create_year_month_day_columns_from_dataframe_column(
        self, date_column_name: str
    ) -> "DataFrameOps":
        """Add ``year``/``month``/``day`` partition keys from a date column (P9)."""
        c = F.col(date_column_name)
        return DataFrameOps(
            self.df.withColumns(
                {"year": F.year(c), "month": F.month(c), "day": F.dayofmonth(c)}
            )
        )

    def create_year_month_day_columns_from_date(
        self, d: date | datetime
    ) -> "DataFrameOps":
        """Add literal ``year``/``month``/``day`` batch-date stamps (P10)."""
        return DataFrameOps(
            self.df.withColumns(
                {
                    "year": F.lit(d.year),
                    "month": F.lit(d.month),
                    "day": F.lit(d.day),
                }
            )
        )

    # ---- P11: cast-to-string boundary --------------------------------------

    def cast_all_to_string(self) -> "DataFrameOps":
        """Cast every column to string — the raw-ingest boundary coercion (P11)."""
        return DataFrameOps(
            self.df.select([F.col(c).cast("string").alias(c) for c in self.df.columns])
        )

    # ---- X1/X2: physical partitioning --------------------------------------

    def optimize_partition(self, records_by_partition: int = 250_000) -> "DataFrameOps":
        """Count-based repartition/coalesce to ~``records_by_partition`` rows (X1).

        Kept for explicit output-file-count control; note this runs a
        count job. Under AQE (on by default in this engine) prefer
        leaving partition sizing to
        ``spark.sql.adaptive.advisoryPartitionSizeInBytes``.
        """
        rows = self.df.count()
        # ceil, not floor: 499,999 rows at a 250k cap must yield 2
        # partitions (~250k each), not 1 double-size file.
        target = max(-(-rows // records_by_partition), 1)
        current = self.df.rdd.getNumPartitions()
        if target > current:
            return DataFrameOps(self.df.repartition(target))
        if target < current:
            return DataFrameOps(self.df.coalesce(target))
        return self

    def optimize_partitions_by_partition_columns(
        self, partition_by_list: list[str]
    ) -> "DataFrameOps":
        """Hash-repartition on the Hive partition columns (X2): one task —
        and so one file — per output partition on a partitioned write."""
        return DataFrameOps(self.df.repartition(*partition_by_list))
