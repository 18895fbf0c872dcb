"""The byte-based media oracles must hash-match on a NON-ASCII corpus.

The r4 media oracles enumerated *characters* and relied on the pinned
all-ASCII testdata (1 char == 1 byte). They now decode the UTF-8
*bytes* from the hex-encoded payload, so parity must survive multibyte
characters — this fixture injects accented Latin, CJK, emoji (4-byte
UTF-8), and mixed-script rows and re-runs the driver-faithful compare
against a private documents.parquet (never the shared testdata).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_check import compare  # noqa: E402

# Multibyte-heavy rows; texts long enough that every doc clears the
# PHASH_BITS minimum-payload gate (64 bytes) so the pHash query has
# non-trivial work.
_TEXTS = [
    "café au lait, déjà vu — naïve façade, π ≈ 3.14159, Ωmega" * 3,
    "日本語のテキストです。大規模言語モデルの学習データ。" * 4,
    "mixed ascii and 中文 and русский and हिन्दी all in one line" * 3,
    "emoji corpus 🚀🔥🎉 with 4-byte codepoints 𝔘𝔫𝔦𝔠𝔬𝔡𝔢" * 3,
    "plain ascii control row to keep both byte regimes in play" * 3,
    "ümlauts über alles: äöüß ÄÖÜ — ÉÈÊË éèêë" * 4,
]

_BYTE_QUERIES = [
    "media_decode_stats",
    "media_byte_histogram",
    "media_frame_energy",
    "media_phash_neardup",
    "media_fingerprint",  # sha256/md5 of the string hash UTF-8 bytes
    "media_frame_sample",  # hex-compared binary frames
    "media_resize_stub",  # hex-compared strided bytes
]


@pytest.fixture(scope="module")
def nonascii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nonascii_docs")
    # Two near-identical emoji rows so the pHash near-dup join emits
    # at least one candidate pair with multibyte block boundaries.
    texts = _TEXTS + [_TEXTS[3][:-1] + "!"]
    table = pa.table(
        {
            "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["xx"] * len(texts), pa.string()),
            "source": pa.array(["fixture"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


def test_fixture_is_genuinely_multibyte(nonascii_dir):
    pdf = pq.read_table(os.path.join(nonascii_dir, "documents.parquet"))
    texts = pdf.column("text").to_pylist()
    assert any(len(t.encode()) > len(t) for t in texts)
    assert any(max(ord(c) for c in t) > 0xFFFF for t in texts)  # 4-byte


@pytest.mark.parametrize("name", _BYTE_QUERIES)
def test_byte_oracle_matches_on_nonascii_corpus(spark, name, nonascii_dir):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    problems = compare(qs[name](spark, nonascii_dir), osql[name], nonascii_dir)
    assert not problems, f"{name} on non-ASCII corpus: " + "; ".join(problems)
