"""The cold-gate / failure-cleanup sweepers in tools/ and the scratch
artifacts exec_util builds must agree on ONE temp root forever — the
r9 ADVICE class was a literal "/tmp" glob that silently swept nothing
under a non-default TMPDIR, leaving "cold" verification runs warm.
These pins need no Spark session.
"""

from __future__ import annotations

import ast
import fnmatch
import os

from etl_projects_spark.operators import exec_util

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def test_scratch_paths_match_the_sweep_pattern(tmp_path, monkeypatch):
    # Under ANY temp root (simulated via TMPDIR), both the completed
    # artifact path and build_once's in-flight .tmp sibling must match
    # the one sweep pattern. tempfile caches gettempdir(), so patch
    # the cache rather than the env.
    import tempfile

    monkeypatch.setattr(tempfile, "tempdir", str(tmp_path))
    src = tmp_path / "src.parquet"
    src.write_bytes(b"x")
    pattern = exec_util.scratch_glob_pattern()
    assert pattern.startswith(str(tmp_path))
    art = exec_util.scratch_path("unit", str(src))
    assert fnmatch.fnmatch(art, pattern), (art, pattern)
    assert fnmatch.fnmatch(f"{art}.tmp.1234", pattern), "build_once tmp"


def test_tools_sweepers_use_the_shared_pattern():
    # No tool may reintroduce its own literal glob: every rmtree-sweep
    # in verify_window.py / repeat_check.py must come from
    # scratch_glob_pattern(), and neither file may contain a hardcoded
    # spark_graft glob string.
    for fname in ("verify_window.py", "repeat_check.py"):
        with open(os.path.join(TOOLS, fname)) as f:
            source = f.read()
        tree = ast.parse(source)
        literals = [
            node.value
            for node in ast.walk(tree)
            if isinstance(node, ast.Constant)
            and isinstance(node.value, str)
            # path-shaped glob literals only (a bare join component or
            # an absolute path); prose like the --cold help may still
            # NAME the pattern
            and (
                node.value == "spark_graft_*"
                or node.value.endswith("/spark_graft_*")
            )
        ]
        assert not literals, f"{fname} hardcodes a scratch glob: {literals}"
        assert "scratch_glob_pattern" in source, (
            f"{fname} no longer routes its sweep through "
            "exec_util.scratch_glob_pattern()"
        )
