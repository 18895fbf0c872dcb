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
    so a 1-in-``stride`` sample moves 1/stride of the bytes. Frames
    stay BINARY — byte slices of a media payload are not text, and
    on a multibyte corpus a UTF-8 decode of an arbitrary slice would
    be lossy.
    """
    return (
        media.select(
            "doc_id",
            # empty payloads yield zero frames, not an illegal
            # sequence(1, 0) boundary error
            F.explode(
                F.when(
                    F.col("meta.byte_len") >= 1,
                    F.sequence(
                        F.lit(1), F.col("meta.byte_len"), F.lit(stride)
                    ),
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("off"),
            "payload",
        )
        .select(
            "doc_id",
            ((F.col("off") - 1) / stride).cast("long").alias("frame_no"),
            F.expr(f"substring(payload, off, {frame_size})").alias("frame"),
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
            # Zero-byte payloads are SKIPPED, not emitted as (0.0, 0):
            # a mean over no bytes is undefined, and the byte-level
            # twin (GROUP BY over the exploded bytes) naturally has no
            # row for such a doc — emitting one here would diverge.
            keep = [
                i for i, payload in enumerate(batch["payload"])
                if len(payload)
            ]
            if not keep:
                continue
            batch = batch.iloc[keep]
            stats = []
            for payload in batch["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                # RAW double mean (exact integer sum, one IEEE divide)
                # — never round engine-side: round(x, 6) lands on
                # exactly-representable halves (e.g. 93.7265625) where
                # numpy rounds half-even and DuckDB half-away, and the
                # two engines disagree at the 6th decimal. The raw
                # quotient is bit-identical on both engines and the
                # comparator rounds at 9 dp.
                stats.append((int(arr.sum()) / arr.size, arr.size))
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "width": batch["width"].to_numpy(),
                    "height": batch["height"].to_numpy(),
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
    embedding/feature extractor would produce. Bucket index is
    ``v * buckets // 256`` (identical to ``v // (256 // buckets)``
    for power-of-two divisors, which is what the catalog oracle
    assumes) so the top bytes still land in the last bucket when
    ``buckets`` does not divide 256 — counts are never silently
    dropped.
    """

    def run(batches):
        import numpy as np
        import pandas as pd

        for batch in batches:
            hists = []
            for payload in batch["payload"]:
                arr = (
                    np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                    * buckets
                    // 256
                )
                hists.append(
                    np.bincount(arr, minlength=buckets)[:buckets].tolist()
                )
            yield pd.DataFrame({"doc_id": batch["doc_id"], "hist": hists})

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, hist array<long>"
    )


RESIZE_STRIDE = 4  # resize_stub: keep every 4th byte ("quarter resolution")
ENERGY_FRAME = 64  # frame_energy: bytes per analysis window


def resize_stub(media: DataFrame, stride: int = RESIZE_STRIDE) -> DataFrame:
    """Arrow-batched RESIZE stage stub: every ``stride``-th payload
    byte survives (a deterministic stand-in for a real image resample
    — the codec isn't in this container). The SPARK-side contract is
    real: binary in / binary out through ``mapInPandas`` Arrow
    batches, per-row output bytes ≈ input/stride, so a fleet of
    executors streams batches without materializing whole partitions.

    Output: (doc_id, orig_bytes, resized_bytes, resized_md5,
    resized_hex) — md5 and hex both prove the exact output bytes, not
    just their count (hex is what the DuckDB oracle can replay —
    byte-for-byte — since SQL engines cannot md5 a blob).
    """
    import hashlib

    import pandas as pd

    def run(batches):
        for b in batches:
            rows = {"doc_id": [], "orig_bytes": [], "resized_bytes": [],
                    "resized_md5": [], "resized_hex": []}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                resized = bytes(payload)[::stride]
                rows["doc_id"].append(doc_id)
                rows["orig_bytes"].append(len(payload))
                rows["resized_bytes"].append(len(resized))
                rows["resized_md5"].append(hashlib.md5(resized).hexdigest())
                rows["resized_hex"].append(resized.hex())
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id long, orig_bytes long, resized_bytes long, "
        "resized_md5 string, resized_hex string",
    )


def frame_energy(media: DataFrame, frame: int = ENERGY_FRAME) -> DataFrame:
    """Arrow-batched AUDIO-FEATURE stage stub: payload bytes read as
    unsigned 8-bit samples, RMS energy per ``frame``-byte window — the
    windowed-feature extraction shape (MFCC/spectrogram pipelines)
    with the codec stubbed to raw bytes. numpy does the squaring and
    windowed reduction per Arrow batch; only (doc, frame, energy)
    rows leave the task — payload bytes never shuffle.

    Output: (doc_id, n_frames, rms_first, rms_max) with RMS rounded to
    6 dp (sums of integer squares are exact; one sqrt per frame).
    """
    import numpy as np
    import pandas as pd

    def run(batches):
        for b in batches:
            rows = {"doc_id": [], "n_frames": [], "rms_first": [],
                    "rms_max": []}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                x = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n = (len(x) + frame - 1) // frame
                rms = [
                    round(
                        float(
                            np.sqrt(
                                (x[i * frame:(i + 1) * frame] ** 2).sum()
                                / len(x[i * frame:(i + 1) * frame])
                            )
                        ),
                        6,
                    )
                    for i in range(n)
                ]
                rows["doc_id"].append(doc_id)
                rows["n_frames"].append(n)
                rows["rms_first"].append(rms[0] if rms else None)
                rows["rms_max"].append(max(rms) if rms else None)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        run,
        schema="doc_id long, n_frames long, rms_first double, rms_max double",
    )


PHASH_BITS = 16  # perceptual hash width (bits = equal-width payload blocks)


def perceptual_hash(media: DataFrame, bits: int = PHASH_BITS) -> DataFrame:
    """Arrow-batched PERCEPTUAL-HASH stage stub: the payload is split
    into ``bits`` equal-width byte blocks and bit *i* is set when block
    *i*'s energy (sum of squared byte values) exceeds the payload-wide
    mean — the block-mean-vs-global-mean structure of an image aHash /
    pHash, with the DCT stubbed to raw byte energy (codec not in this
    container; swap ``np.frombuffer`` for a decoded pixel array on a
    real cluster — the hash layout and join plumbing don't change).

    Exactness contract: the bit test cross-multiplies exact integers
    (``block_ss * n_total > total_ss * block_len``) instead of
    comparing float means, so the hash is replayable bit-for-bit in
    any engine. Payloads shorter than ``bits`` bytes are skipped.

    Output: (doc_id, phash bigint) — one narrow row per payload;
    payload bytes never shuffle.
    """
    import numpy as np
    import pandas as pd

    def run(batches):
        for b in batches:
            rows = {"doc_id": [], "phash": []}
            for doc_id, payload in zip(b["doc_id"], b["payload"]):
                x = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n = len(x)
                if n < bits:
                    continue
                sq = x * x
                total_ss = int(sq.sum())
                # byte j belongs to block j*bits//n (equal-width split,
                # replayable as integer division in any SQL engine)
                blk = (np.arange(n) * bits) // n
                block_ss = np.zeros(bits, dtype=np.int64)
                np.add.at(block_ss, blk, sq)
                block_len = np.bincount(blk, minlength=bits)
                h = 0
                for i in range(bits):
                    if int(block_ss[i]) * n > total_ss * int(block_len[i]):
                        h |= 1 << i
                rows["doc_id"].append(doc_id)
                rows["phash"].append(h)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        run, schema="doc_id long, phash long"
    )
