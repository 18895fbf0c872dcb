"""Multimodal-column operators: image/audio/video as opaque binary.

The reference has no media handling (closest analog: opaque string
payloads flowing through its scrape→validate→export path,
``etl_projects/scrapers/pipelines.py:10-17``); these operators are the
training-data-pipeline extension — the Spark-side plumbing a 100 TB
multimodal corpus needs:

- **schema**: one ``payload binary`` column + a typed ``meta`` struct
  (media_type, byte_len, width/height/n_frames) so Catalyst can prune
  metadata-only queries without touching payload bytes;
- **fingerprint / frame-sample** stay JVM-side (``sha2``, ``md5``,
  ``sequence``+``substring`` — whole-stage codegen, no Python);
- **decode / feature-extract** run as Arrow-batched ``mapInPandas``
  (the real codec libraries — PIL/ffmpeg — are not in this
  environment, so the codec call is stubbed behind
  ``NotImplementedError`` with a deterministic byte-level fake; the
  schema, partitioning, UDF signature, and batch shape are real).

Scale notes: payload bytes never shuffle — every operator is a narrow
map over the scan, emitting only small derived rows. Select
``meta.*``-only when possible so the parquet reader skips the binary
column entirely (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_SIZE = 32  # bytes per sampled frame
FRAME_STRIDE = 64  # sample one frame every N bytes
HIST_BUCKETS = 16  # byte-histogram buckets (256/16 wide)

MEDIA_TYPES = ["image", "audio", "video"]


def to_media(docs: DataFrame) -> DataFrame:
    """documents → multimodal table: opaque binary payload + typed meta.

    The payload is the UTF-8 encoding of the text (a deterministic
    stand-in for real image/audio bytes); media_type cycles by doc_id.
    Pure projection — no shuffle, fully codegen'd.
    """
    byte_len = F.octet_length("text")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.struct(
            byte_len.alias("byte_len"),
            (F.col("doc_id") % 16 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 9 + 9).cast("int").alias("height"),
            F.ceil(byte_len / FRAME_STRIDE).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def fingerprint(media: DataFrame) -> DataFrame:
    """Content fingerprints for exact dedup of binary payloads.

    sha2/md5 are JVM built-ins over the binary column — this is the
    exact-dedup key for a petabyte media corpus (groupBy sha256 hits
    map-side partial aggregation; no payload bytes shuffle).
    """
    return media.select(
        "doc_id",
        F.sha2("payload", 256).alias("sha256_hex"),
        F.md5("payload").alias("md5_hex"),
        F.col("meta.byte_len").alias("n_bytes"),
    )


def frame_sample(
    media: DataFrame, frame_size: int = FRAME_SIZE, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Sample fixed-size frames every ``stride`` bytes ("video" path).

    JVM-native: ``sequence`` generates frame offsets, ``explode``
    fans out one row per frame, ``substring`` slices the payload.
    No Python in the loop; output rows carry only the sampled slice,
    so a 1-in-``stride`` sample moves 1/stride of the bytes.
    """
    return (
        media.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("meta.byte_len"), F.lit(stride))
            ).alias("off"),
            "payload",
        )
        .select(
            "doc_id",
            ((F.col("off") - 1) / stride).cast("long").alias("frame_no"),
            F.decode(
                F.expr(f"substring(payload, off, {frame_size})"), "UTF-8"
            ).alias("frame"),
        )
    )


def decode_image(payload_bytes: bytes) -> "object":
    """Real image decode — requires PIL, which is not in this
    environment. The Spark plumbing calls :func:`decode_stats` with
    ``fake=True`` instead; swap this in when the codec is available."""
    raise NotImplementedError(
        "image decode needs PIL/Pillow; use decode_stats(media, fake=True) "
        "for the deterministic byte-level stand-in"
    )


def decode_stats(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-media decoded stats via Arrow-batched ``mapInPandas``.

    The UDF signature, output schema, and batch shape are exactly what
    a real decoder would use; ``fake=True`` computes deterministic
    byte-level stats (mean/min/max byte value) in numpy instead of
    invoking a codec. One narrow pass, no shuffle; only the small
    stats rows leave the task.
    """
    import pandas as pd  # noqa: F401 (documents the batch type)

    schema = "doc_id long, width int, height int, mean_byte double, n_bytes long"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for batch in batches:
            if not fake:
                decode_image(b"")  # raises NotImplementedError
            stats = []
            for payload in batch["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                stats.append(
                    (round(float(arr.mean()), 6) if arr.size else 0.0, arr.size)
                )
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"],
                    "width": batch["width"],
                    "height": batch["height"],
                    "mean_byte": [s[0] for s in stats],
                    "n_bytes": [s[1] for s in stats],
                }
            )

    narrow = media.select(
        "doc_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return narrow.mapInPandas(run, schema=schema)


def byte_histogram(media: DataFrame, buckets: int = HIST_BUCKETS) -> DataFrame:
    """Byte-value histogram per payload (feature-extraction shape).

    ``mapInPandas`` + ``np.bincount`` per payload; emits one
    ``array<long>`` of ``buckets`` counts per row — the layout a real
    embedding/feature extractor would produce.
    """
    width = 256 // buckets

    def run(batches):
        import numpy as np
        import pandas as pd

        for batch in batches:
            hists = []
            for payload in batch["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8) // width
                hists.append(np.bincount(arr, minlength=buckets)[:buckets].tolist())
            yield pd.DataFrame({"doc_id": batch["doc_id"], "hist": hists})

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, hist array<long>"
    )
