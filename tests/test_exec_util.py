"""exec_util scratch-artifact lifecycle: snapshot keying + build_once."""

from __future__ import annotations

import os

from etl_projects_spark.operators.exec_util import build_once, scratch_path


def test_scratch_path_keys_on_source_snapshot(tmp_path):
    """A regenerated source file (new mtime) must map to a NEW scratch
    path — the driver's vanilla session must never reuse an artifact
    built from a previous testdata vintage (VERDICT r3 item 10)."""
    src = tmp_path / "orders.parquet"
    src.write_text("v1")
    p1 = scratch_path("k", str(src))
    assert p1 == scratch_path("k", str(src))  # stable for one snapshot
    os.utime(src, (1000, 1000))  # simulate driver regenerating testdata
    p2 = scratch_path("k", str(src))
    assert p1 != p2
    # distinct artifact kinds over the same snapshot never collide
    assert scratch_path("a", str(src)) != scratch_path("b", str(src))


def test_scratch_path_same_second_regeneration(tmp_path):
    """A source rewritten within the SAME whole second (different size
    or sub-second mtime) must still mint a new key — whole-second
    mtime keying silently reused stale artifacts (ADVICE r4)."""
    src = tmp_path / "docs.parquet"
    src.write_text("v1")
    os.utime(src, ns=(1_000_000_000_000, 1_000_000_000_000))
    p1 = scratch_path("samesec", str(src))
    # same integer second, different nanosecond component
    os.utime(src, ns=(1_000_000_000_000, 1_000_000_500_000))
    p2 = scratch_path("samesec", str(src))
    assert p1 != p2
    # same mtime entirely, different size → still a new key
    src.write_text("v2-longer")
    os.utime(src, ns=(1_000_000_000_000, 1_000_000_500_000))
    p3 = scratch_path("samesec", str(src))
    assert p3 != p2


def test_scratch_path_prunes_stale_vintages(tmp_path):
    """Minting a new vintage key removes the older sibling artifact of
    the same kind, so /tmp does not accumulate dead vintages."""
    src = tmp_path / "t.parquet"
    src.write_text("v1")
    p1 = scratch_path("prunekind", str(src))
    os.makedirs(p1, exist_ok=True)
    os.utime(src, ns=(2_000_000_000_000, 2_000_000_000_000))
    p2 = scratch_path("prunekind", str(src))
    assert p2 != p1
    assert not os.path.exists(p1)  # stale vintage pruned
    # other kinds' artifacts are untouched
    other = scratch_path("otherkind", str(src))
    os.makedirs(other, exist_ok=True)
    os.utime(src, ns=(3_000_000_000_000, 3_000_000_000_000))
    scratch_path("prunekind", str(src))
    assert os.path.exists(other)


def test_build_once_builds_exactly_once(tmp_path):
    calls = []

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "done"), "w") as f:
            f.write("ok")
        calls.append(1)

    path = str(tmp_path / "artifact")
    build_once(path, build, marker="done")
    build_once(path, build, marker="done")
    assert len(calls) == 1
    assert os.path.exists(os.path.join(path, "done"))
