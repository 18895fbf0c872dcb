"""Multimodal operators: numpy/pure-Python oracles for the
non-SQL-expressible mapInPandas paths, plus plumbing checks."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from etl_projects_spark.operators import multimodal
from etl_projects_spark.queries import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.to_media(load(spark, SF_DIR, "documents"))


@pytest.fixture(scope="module")
def docs_pd(spark):
    return load(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    meta = dict(media.dtypes)["meta"]
    assert "byte_len" in meta and "n_frames" in meta


def test_fingerprint_matches_hashlib(media, docs_pd):
    got = {r["doc_id"]: r for r in multimodal.fingerprint(media).collect()}
    for _, row in docs_pd.head(50).iterrows():
        raw = row["text"].encode("utf-8")
        r = got[row["doc_id"]]
        assert r["sha256_hex"] == hashlib.sha256(raw).hexdigest()
        assert r["md5_hex"] == hashlib.md5(raw).hexdigest()
        assert r["n_bytes"] == len(raw)


def test_decode_stats_matches_numpy(media, docs_pd):
    got = {r["doc_id"]: r for r in multimodal.decode_stats(media).collect()}
    # One row per NON-EMPTY payload: a mean over zero bytes is
    # undefined, so empty docs are skipped — matching the byte-exploded
    # oracle, which has no group for them.
    nonempty = docs_pd[docs_pd["text"].str.len() > 0]
    assert len(got) == len(nonempty)
    for _, row in nonempty.head(50).iterrows():
        arr = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8)
        r = got[row["doc_id"]]
        assert r["n_bytes"] == arr.size
        # raw IEEE quotient, not rounded (DETERMINISM.md recipe 29)
        assert r["mean_byte"] == int(arr.sum()) / arr.size
        assert 16 <= r["width"] < 32 and 9 <= r["height"] < 18


def test_decode_stats_skips_empty_payload(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "")], "doc_id long, text string"
    )
    out = multimodal.decode_stats(multimodal.to_media(df)).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00")


def test_byte_histogram_matches_numpy(media, docs_pd):
    got = {r["doc_id"]: r["hist"] for r in multimodal.byte_histogram(media).collect()}
    for _, row in docs_pd.head(20).iterrows():
        arr = np.frombuffer(row["text"].encode("utf-8"), dtype=np.uint8) // 16
        expect = np.bincount(arr, minlength=16)[:16].tolist()
        assert got[row["doc_id"]] == expect
    # histogram counts sum to payload length
    any_id = docs_pd["doc_id"].iloc[0]
    assert sum(got[any_id]) == len(docs_pd["text"].iloc[0].encode("utf-8"))


def test_frame_sample_slices(media, docs_pd, spark):
    frames = multimodal.frame_sample(media).filter("doc_id = 0").collect()
    raw = docs_pd.set_index("doc_id").loc[0, "text"].encode("utf-8")
    expect = [
        raw[off : off + multimodal.FRAME_SIZE]
        for off in range(0, len(raw), multimodal.FRAME_STRIDE)
    ]
    got = [
        bytes(r["frame"]) for r in sorted(frames, key=lambda r: r["frame_no"])
    ]
    assert got == expect


def test_resize_stub_matches_python(spark):
    import hashlib
    from etl_projects_spark.operators import multimodal
    from etl_projects_spark.queries import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    media = multimodal.to_media(docs)
    got = {r.doc_id: (r.orig_bytes, r.resized_bytes, r.resized_md5,
                      r.resized_hex)
           for r in multimodal.resize_stub(media).collect()}
    for row in docs.select("doc_id", "text").collect():
        raw = row.text.encode()
        resized = raw[::multimodal.RESIZE_STRIDE]
        assert got[row.doc_id] == (
            len(raw), len(resized), hashlib.md5(resized).hexdigest(),
            resized.hex())


def test_frame_energy_matches_numpy(spark):
    import numpy as np
    from etl_projects_spark.operators import multimodal
    from etl_projects_spark.queries import load
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents")
    media = multimodal.to_media(docs)
    got = {r.doc_id: (r.n_frames, r.rms_first, r.rms_max)
           for r in multimodal.frame_energy(media).collect()}
    fr = multimodal.ENERGY_FRAME
    for row in docs.select("doc_id", "text").collect():
        x = np.frombuffer(row.text.encode(), dtype=np.uint8).astype(np.int64)
        n = (len(x) + fr - 1) // fr
        rms = [round(float(np.sqrt((x[i*fr:(i+1)*fr] ** 2).sum()
                                   / len(x[i*fr:(i+1)*fr]))), 6)
               for i in range(n)]
        assert got[row.doc_id] == (n, rms[0], max(rms))


def test_perceptual_hash_matches_numpy(spark):
    import numpy as np

    from etl_projects_spark.operators import multimodal

    texts = ["a" * 40, "abcdefgh" * 8, "z" * 15, "Aa" * 100, "x" * 16]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    media = multimodal.to_media(df)
    got = {
        r["doc_id"]: r["phash"]
        for r in multimodal.perceptual_hash(media).collect()
    }

    def ref_phash(t: str) -> int | None:
        x = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
        n = len(x)
        bits = multimodal.PHASH_BITS
        if n < bits:
            return None
        sq = x * x
        total = int(sq.sum())
        h = 0
        for i in range(bits):
            sel = (np.arange(n) * bits) // n == i
            if int(sq[sel].sum()) * n > total * int(sel.sum()):
                h |= 1 << i
        return h

    want = {i: ref_phash(t) for i, t in enumerate(texts) if ref_phash(t) is not None}
    assert got == want
    # constant payloads have zero contrast → all bits off
    assert got[0] == 0
    # a payload shorter than PHASH_BITS bytes is skipped, not hashed
    assert 2 not in got


def test_frame_sample_empty_payload_yields_no_frames(spark):
    """byte_len=0 must produce zero frames, not an illegal
    sequence(1, 0) boundary error (r5 operator review)."""
    import pandas as pd
    from etl_projects_spark.operators import multimodal

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["", "abcd"]})
    )
    media = multimodal.to_media(docs)
    rows = multimodal.frame_sample(media).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_byte_histogram_nondivisor_buckets_conserve_counts(spark):
    """buckets=10 (not a divisor of 256): high byte values must land
    in the last bucket, never be sliced off — totals equal payload
    length (r5 operator review)."""
    import pandas as pd
    from etl_projects_spark.operators import multimodal

    text = "".join(chr(c) for c in range(1, 128)) + "🚀" * 5  # 0xF0 lead bytes
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    media = multimodal.to_media(docs)
    hist = multimodal.byte_histogram(media, buckets=10).collect()[0]["hist"]
    assert len(hist) == 10
    assert sum(hist) == len(text.encode("utf-8"))
    # the 0xF0 (240) lead bytes land in the last bucket (240*10//256=9)
    assert hist[-1] >= 5
