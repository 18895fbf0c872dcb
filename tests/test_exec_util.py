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
