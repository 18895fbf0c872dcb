"""Warehouse bulk-COPY sink (K5): stage → manifest → COPY.

The reference's final hop loads each DW table into Redshift by staging
it under the DW bucket and issuing a warehouse-side COPY with a
Spectrum IAM role (``etl_projects/base/processors/builders/
dw_sub_dag_builder.py:93-108``; the ``load_table_to_redshift.py`` job
itself is absent from the repo — its semantics are implied by the
parameters ``(env, spectrum_iam_role, dw_bucket, dw_schema, table)``).
Bulk COPY from staged files — never row INSERTs — is the only shape
that survives warehouse volumes, so that split is preserved here:
Spark does the distributed staging, the warehouse does the load.

Three independently-testable pieces:

1. :func:`stage_for_copy` — Spark writes gzip-JSONL / gzip-CSV /
   parquet part files (distributed: each executor writes its own
   partitions) plus a Redshift-style MANIFEST json enumerating every
   part with its byte size. Only the manifest assembly — a directory
   listing, metadata-sized — touches the driver, so staging scales
   with the cluster at 100 TB.
2. :func:`copy_statement` — the warehouse-side COPY SQL; pure string
   assembly a live deployment hands to Redshift verbatim.
3. :func:`copy_into_duckdb` — an offline warehouse double executing
   the COPY *semantics* (load exactly the manifest's entries, fail on
   a missing mandatory part) against DuckDB, proving the staged bytes
   are loadable by a second engine without AWS.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame

_PART_GLOBS = {
    "jsonl_gz": "part-*.json.gz",
    "csv_gz": "part-*.csv.gz",
    "parquet": "part-*.parquet",
}

_COPY_FORMAT_CLAUSE = {
    "jsonl_gz": "FORMAT AS JSON 'auto' GZIP",
    # IGNOREHEADER 1: stage_for_copy writes header=true into EVERY csv
    # part file; without it a real Redshift COPY loads each part's
    # header line as a data row (or aborts on type conversion). The
    # DuckDB double masks this — read_csv_auto sniffs headers — so the
    # clause is the live-warehouse contract, pinned by test.
    "csv_gz": "FORMAT AS CSV GZIP IGNOREHEADER 1",
    "parquet": "FORMAT AS PARQUET",
}

_DUCKDB_READER = {
    "jsonl_gz": "read_ndjson_auto",
    "csv_gz": "read_csv_auto",
    "parquet": "read_parquet",
}

MANIFEST_NAME = "manifest.json"


def stage_for_copy(df: DataFrame, path: str, fmt: str = "jsonl_gz") -> str:
    """Stage ``df`` under ``path`` as COPY-loadable part files and
    write a Redshift-style manifest enumerating them. Returns the
    manifest path.

    The write is a plain distributed ``DataFrameWriter`` job; the
    driver only lists the output directory afterwards (file *names*,
    not data). Timestamps are staged in ISO form by Spark's JSON/CSV
    writers, which both Redshift COPY and the DuckDB double parse.
    """
    if fmt not in _PART_GLOBS:
        raise ValueError(f"fmt must be one of {sorted(_PART_GLOBS)}, got {fmt!r}")
    writer = df.write.mode("overwrite")
    if fmt == "jsonl_gz":
        writer.option("compression", "gzip").json(path)
    elif fmt == "csv_gz":
        writer.option("compression", "gzip").option("header", "true").csv(path)
    else:
        writer.parquet(path)
    # glob.escape: a staging path containing glob metacharacters
    # (e.g. a ds like 'run[2024-01-05]') would otherwise read as a
    # character class, match nothing, and report a successful stage
    # as a failure.
    parts = sorted(glob.glob(os.path.join(glob.escape(path), _PART_GLOBS[fmt])))
    if not parts:
        raise RuntimeError(f"staging produced no part files under {path}")
    manifest = {
        "entries": [
            {
                "url": p,
                "mandatory": True,
                "meta": {"content_length": os.path.getsize(p)},
            }
            for p in parts
        ]
    }
    mpath = os.path.join(path, MANIFEST_NAME)
    with open(mpath, "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    return mpath


def copy_statement(
    table: str, manifest_url: str, iam_role: str, fmt: str = "jsonl_gz"
) -> str:
    """The warehouse-side COPY for a staged manifest (Redshift
    dialect, mirroring the reference's Spectrum-IAM-role load)."""
    clause = _COPY_FORMAT_CLAUSE[fmt]
    return (
        f"COPY {table} FROM '{manifest_url}' "
        f"IAM_ROLE '{iam_role}' MANIFEST {clause}"
    )


def manifest_entries(manifest_path: str) -> list[dict]:
    """Parsed manifest entries, with mandatory-file existence
    enforced exactly like a warehouse COPY would."""
    with open(manifest_path, encoding="utf-8") as f:
        entries = json.load(f)["entries"]
    missing = [
        e["url"]
        for e in entries
        if e.get("mandatory", True) and not os.path.exists(e["url"])
    ]
    if missing:
        raise FileNotFoundError(f"manifest lists missing mandatory parts: {missing}")
    return entries


def copy_into_duckdb(
    con, table: str, manifest_path: str, fmt: str = "jsonl_gz"
) -> int:
    """Offline warehouse double: perform the COPY semantics against a
    DuckDB connection — load precisely the manifest's entries into
    ``table`` (replacing it) — and return the loaded row count."""
    entries = manifest_entries(manifest_path)
    reader = _DUCKDB_READER[fmt]
    files_sql = "[" + ", ".join(
        "'" + e["url"].replace("'", "''") + "'" for e in entries
    ) + "]"
    con.execute(
        f"CREATE OR REPLACE TABLE {table} AS SELECT * FROM {reader}({files_sql})"
    )
    return con.execute(f"SELECT COUNT(*) FROM {table}").fetchone()[0]
