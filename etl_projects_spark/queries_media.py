"""Query-catalog entries for the multimodal (binary-column) operators.

The media table is derived deterministically from ``documents``
(payload = UTF-8 bytes of text), so the JVM-side operators have exact
DuckDB oracles; the ``mapInPandas`` decode/feature paths are
non-SQL-expressible by design (rows-only driver check + pytest
oracles against numpy in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_projects_spark.operators import multimodal
from etl_projects_spark.queries import _q, load


# The payload is the UTF-8 encoding of `text`. DuckDB replays the
# byte-level UDF arithmetic BYTE-exactly on any corpus (ASCII or not):
# hex(encode(text)) renders the UTF-8 bytes two hex digits each, and
# CAST('0x'||pair AS INTEGER) recovers byte i's value — no
# character/byte conflation anywhere in these oracles. _BY_CTE is the
# single source of truth for the hex decode; _BYTES_CTE composes the
# per-byte enumeration on top of it.
_BY_CTE = """
    by AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents)
"""
_BYTES_CTE = f"""
    {_BY_CTE},
    ch AS (
      SELECT doc_id,
             CAST('0x' || substring(hx, 2 * i - 1, 2) AS INTEGER) AS v,
             i - 1 AS idx, n
      FROM by, UNNEST(generate_series(1, n)) t(i))
"""


@_q(
    "media_fingerprint",
    """
    SELECT doc_id,
           sha256(text) AS sha256_hex,
           md5(text) AS md5_hex,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def media_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload content fingerprint (exact media dedup key).
    JVM sha2/md5 over the payload — codegen'd, zero Python."""
    media = multimodal.to_media(load(spark, sf_dir, "documents"))
    return multimodal.fingerprint(media)


@_q(
    "media_frame_sample",
    f"""
    WITH {_BY_CTE}
    SELECT doc_id,
           CAST((x - 1) / {multimodal.FRAME_STRIDE} AS BIGINT) AS frame_no,
           substring(hx, CAST(2 * x - 1 AS INTEGER),
                     {2 * multimodal.FRAME_SIZE}) AS frame_hex
    FROM by, UNNEST(generate_series(1, n, {multimodal.FRAME_STRIDE})) t(x)
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the video-like payload: sequence+explode+
    substring, all JVM-side; moves frame_size/stride of the bytes.
    The catalog entry hexes each BINARY frame so the DuckDB twin can
    replay the slice from the hex-encoded payload — byte-exact on any
    corpus (a frame boundary may split a multibyte character; binary
    slices don't care)."""
    media = multimodal.to_media(load(spark, sf_dir, "documents"))
    return multimodal.frame_sample(media).select(
        "doc_id", "frame_no", F.hex("frame").alias("frame_hex")
    )


@_q(
    "media_decode_stats",
    f"""
    WITH {_BYTES_CTE}
    SELECT doc_id,
           CAST(doc_id % 16 + 16 AS INTEGER) AS width,
           CAST(doc_id % 9 + 9 AS INTEGER) AS height,
           CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_byte,
           CAST(COUNT(*) AS BIGINT) AS n_bytes
    FROM ch
    GROUP BY doc_id
    """,
)
def media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed-codec decode via Arrow-batched mapInPandas: real UDF
    signature/schema/batch shape, deterministic byte-level stats.
    The DuckDB oracle replays the byte arithmetic from the
    hex-encoded UTF-8 payload — byte-exact on any corpus."""
    media = multimodal.to_media(load(spark, sf_dir, "documents"))
    return multimodal.decode_stats(media)


@_q(
    "media_byte_histogram",
    f"""
    WITH {_BYTES_CTE}
    SELECT doc_id,
           CAST(v // {256 // multimodal.HIST_BUCKETS} AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ch
    GROUP BY doc_id, bucket
    """,
)
def media_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram feature extraction (the embedding-extractor
    layout): one narrow Arrow pass, array<long> features out. The
    catalog entry explodes the histogram to (doc_id, bucket, n) rows —
    the raw array<long> is unhashable in the driver's pandas
    canonicalizer — keeping only non-empty buckets so the DuckDB
    GROUP BY twin is exact."""
    media = multimodal.to_media(load(spark, sf_dir, "documents"))
    hist = multimodal.byte_histogram(media)
    return (
        hist.select("doc_id", F.posexplode("hist").alias("bucket", "n"))
        .filter(F.col("n") > 0)
        .select("doc_id", F.col("bucket").cast("int").alias("bucket"), "n")
    )


@_q(
    "media_resize_stub",
    f"""
    WITH {_BY_CTE}
    SELECT doc_id,
           CAST(n AS BIGINT) AS orig_bytes,
           CAST(len(generate_series(1, n, {multimodal.RESIZE_STRIDE}))
                AS BIGINT) AS resized_bytes,
           COALESCE(lower(array_to_string(
             list_transform(generate_series(1, n,
                                            {multimodal.RESIZE_STRIDE}),
                            i -> substring(hx, CAST(2 * i - 1 AS INTEGER),
                                           2)), '')), '') AS resized_hex
    FROM by
    """,
)
def media_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIZE stage of the media pipeline, codec stubbed to a byte
    stride (every 4th byte survives — "quarter resolution"): binary in
    / binary out through real ``mapInPandas`` Arrow batches, and the
    HEX of the exact output bytes is oracle-checked — DuckDB replays
    the stride over the hex-encoded payload, byte-exact on any corpus
    (the md5 column stays on the operator for the numpy pytest oracle;
    SQL engines cannot md5 a blob). Swap the stub body for PIL/ffmpeg
    on a cluster that has them; the schema, batching, and shuffle-free
    shape stay identical."""
    media = multimodal.to_media(load(spark, sf_dir, "documents"))
    return multimodal.resize_stub(media).select(
        "doc_id", "orig_bytes", "resized_bytes", "resized_hex"
    )


@_q(
    "media_frame_energy",
    f"""
    WITH {_BYTES_CTE},
    fe AS (
      SELECT doc_id, v,
             CAST(idx // {multimodal.ENERGY_FRAME} AS INT) AS f
      FROM ch),
    fr AS (
      SELECT doc_id, f,
             round(sqrt(CAST(SUM(v * v) AS DOUBLE) / COUNT(*)), 6) AS rms
      FROM fe GROUP BY 1, 2)
    SELECT doc_id, COUNT(*) AS n_frames,
           MAX(CASE WHEN f = 0 THEN rms END) AS rms_first,
           MAX(rms) AS rms_max
    FROM fr GROUP BY doc_id
    """,
)
def media_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUDIO-FEATURE stage of the media pipeline: payload bytes as
    unsigned 8-bit samples, RMS energy per 64-byte window (the
    windowed-reduction shape of MFCC/spectrogram extraction), numpy
    per Arrow batch. Only (doc, frame-stat) rows leave the task —
    payload bytes never shuffle. Sums of integer squares are exact, so
    the oracle's SQL replay matches to the 6-dp rounding. The oracle
    enumerates the payload's UTF-8 BYTES (hex-pair decode), matching
    the Spark side on any corpus — non-ASCII included (proven by the
    mixed-script fixture in tests/test_media_oracle_bytes.py)."""
    media = multimodal.to_media(load(spark, sf_dir, "documents"))
    return multimodal.frame_energy(media)


PHASH_HAM_MAX = 3  # near-dup threshold; bands = PHASH_HAM_MAX + 1 (pigeonhole)
_PHASH_BANDS = PHASH_HAM_MAX + 1
_BAND_BITS = multimodal.PHASH_BITS // _PHASH_BANDS


@_q(
    "media_phash_neardup",
    f"""
    WITH {_BYTES_CTE},
    cb AS (
      SELECT doc_id, v, idx, n FROM ch
      WHERE n >= {multimodal.PHASH_BITS}),
    blk AS (
      SELECT doc_id, CAST(idx * {multimodal.PHASH_BITS} // n AS INT) AS b,
             SUM(v * v) AS ss, COUNT(*) AS cnt
      FROM cb GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(ss) AS ss_tot, SUM(cnt) AS n_tot
            FROM blk GROUP BY 1),
    ph AS (
      SELECT blk.doc_id,
             CAST(SUM(CASE WHEN ss * n_tot > ss_tot * cnt
                           THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                  AS BIGINT) AS phash
      FROM blk JOIN tot USING (doc_id) GROUP BY 1)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
    FROM ph a JOIN ph b
      ON a.doc_id < b.doc_id
     AND bit_count(xor(a.phash, b.phash)) <= {PHASH_HAM_MAX}
    """,
)
def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup join over the media payloads: the
    image/audio near-dup pipeline end to end — Arrow-batched pHash
    extraction (``multimodal.perceptual_hash``), then banded LSH on
    the hash bits. With hamming ≤ {PHASH_HAM_MAX} and
    {PHASH_HAM_MAX}+1 disjoint bands, the pigeonhole principle makes
    banding EXACT (some band must be untouched), so the blocked join
    returns precisely the brute-force pair set the oracle computes —
    candidate generation is a bounded equi-join shuffle, never
    all-pairs, and verification (one xor+bit_count per candidate) is
    candidate-local. The hash itself is integer-exact, so a
    float-free cross-engine replay hash-matches. Like
    ``media_frame_energy``, the oracle decodes UTF-8 BYTES from the
    hex-encoded payload, so block boundaries agree with the Spark
    pHash on any corpus — multibyte characters included."""
    media = multimodal.to_media(load(spark, sf_dir, "documents"))
    ph = multimodal.perceptual_hash(media)
    bands = ph.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", _BAND_BITS * i)
                    % (1 << _BAND_BITS)
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ph_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("ph_b"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(ph_a ^ ph_b)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .dropDuplicates(["doc_a", "doc_b"])
    )
