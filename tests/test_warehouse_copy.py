"""K5 warehouse COPY: staging, manifest, COPY SQL, and the DuckDB
warehouse double (reference: dw_sub_dag_builder.py:93-108)."""

import os
import tempfile

import duckdb
import pytest

from etl_projects_spark.sinks import warehouse_copy as wc


def test_copy_statement_redshift_dialect():
    sql = wc.copy_statement(
        "dw.orders", "s3://b/stage/manifest.json", "arn:aws:iam::1:role/r", "jsonl_gz"
    )
    assert sql == (
        "COPY dw.orders FROM 's3://b/stage/manifest.json' "
        "IAM_ROLE 'arn:aws:iam::1:role/r' MANIFEST FORMAT AS JSON 'auto' GZIP"
    )
    assert "FORMAT AS PARQUET" in wc.copy_statement("t", "m", "r", "parquet")


def test_bad_format_rejected(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    with pytest.raises(ValueError):
        wc.stage_for_copy(df, tempfile.mkdtemp(), fmt="orc")


@pytest.mark.parametrize("fmt", ["jsonl_gz", "csv_gz", "parquet"])
def test_stage_then_duckdb_copy_roundtrip(spark, sf_dir, fmt):
    df = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="whc_"), "stage")
    mpath = wc.stage_for_copy(df, path, fmt=fmt)

    con = duckdb.connect()
    n = wc.copy_into_duckdb(con, "wh_nation", mpath, fmt=fmt)
    assert n == df.count()
    got = con.execute(
        "SELECT n_nationkey, n_name FROM wh_nation ORDER BY n_nationkey"
    ).fetchall()
    exp = [
        (r.n_nationkey, r.n_name)
        for r in df.select("n_nationkey", "n_name").orderBy("n_nationkey").collect()
    ]
    assert [(int(k), v) for k, v in got] == exp


def test_manifest_enforces_mandatory_parts(spark, sf_dir):
    df = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    path = os.path.join(tempfile.mkdtemp(prefix="whc_"), "stage")
    mpath = wc.stage_for_copy(df, path, fmt="parquet")
    victim = wc.manifest_entries(mpath)[0]["url"]
    os.remove(victim)
    with pytest.raises(FileNotFoundError):
        wc.copy_into_duckdb(duckdb.connect(), "wh_region", mpath, fmt="parquet")


def test_csv_copy_skips_staged_headers():
    """stage_for_copy writes header=true into every csv part, so the
    generated Redshift COPY must carry IGNOREHEADER 1 (the DuckDB
    double auto-sniffs headers and would mask the omission)."""
    sql = wc.copy_statement("t", "m", "r", "csv_gz")
    assert "FORMAT AS CSV GZIP IGNOREHEADER 1" in sql
