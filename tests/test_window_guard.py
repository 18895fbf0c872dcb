"""The catalog churn rule, machine-enforced (r5 VERDICT item 2): any
query whose (source, oracle) shape changed after the driver window
that proved it MUST be in the current first-50 window — otherwise its
green CORRECTNESS row describes code that no longer exists.

No Spark session needed: the guard hashes function sources and oracle
SQL strings only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import window_hashes as wh  # noqa: E402


def test_no_changed_query_escapes_the_window():
    assert wh.violations() == []


def test_every_catalog_query_is_hash_tracked():
    # A query missing from the record would never be flagged on edit.
    recorded = set(wh.current_hashes())
    import json

    with open(wh.HASHES_PATH) as f:
        tracked = set(json.load(f))
    window = set(wh.window_names())
    # out-of-window queries must all be tracked; in-window ones are
    # (re-)recorded by --update before the round's final commit.
    assert recorded - tracked <= window


def test_catalog_and_plans_records_are_fresh():
    # CATALOG.md / PLANS.md are regenerated records; a catalog edit
    # without regeneration leaves them misdescribing the engine.
    import __spark_entry__ as entrymod

    names = set(entrymod.queries())
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, "CATALOG.md")) as f:
        catalog = f.read()
    assert f"{len(names)} queries" in catalog.splitlines()[2], (
        "CATALOG.md header count is stale — run tools/gen_catalog.py"
    )
    with open(os.path.join(root, "PLANS.md")) as f:
        plans = f.read()
    missing = [n for n in names if f"`{n}`" not in catalog]
    missing_plans = [n for n in names if f"| {n} |" not in plans]
    assert not missing, f"queries missing from CATALOG.md: {missing[:5]}"
    assert not missing_plans, (
        f"queries missing from PLANS.md: {missing_plans[:5]} — "
        "run tools/gen_plans.py"
    )


def test_r6_rotation_heads_the_window():
    # The three queries reworked after their r5 window, the three whose
    # source changed in r6 (jaccard de-hinting, word_grams extraction),
    # and the five r6 additions must all sit inside the driver's
    # 50-query sample.
    window = wh.window_names()
    must_be_in = {
        "media_frame_sample",
        "media_resize_stub",
        "mixture_weights_temperature",
        "dedup_ngram_jaccard",
        "dedup_jaccard_df_capped",
        "text_repetition_ratio",
        "embedding_similarity_join",
        "repartition_partition_files",
        "quality_monitor_gate",
        "dw_promotion_gate",
        "gopher_repetition_filter",
    }
    assert must_be_in <= set(window)
    # The stale-row queries lead (first slots), per the VERDICT order.
    assert window[:3] == [
        "media_frame_sample",
        "media_resize_stub",
        "mixture_weights_temperature",
    ]


def test_guard_fires_on_out_of_window_query_edit(monkeypatch):
    """The mechanism, not just the current state: a hash drift on a
    query OUTSIDE the window must be reported."""
    victim = [n for n in wh.current_hashes() if n not in wh.window_names()][0]
    _orig = wh.current_hashes

    def tampered():
        now = _orig()
        now[victim] = "0" * 16
        return now

    monkeypatch.setattr(wh, "current_hashes", tampered)
    bad = wh.violations()
    assert any(victim in v for v in bad), bad


def test_guard_fires_on_engine_module_change(monkeypatch):
    _orig = wh.module_hashes

    def tampered():
        mods = _orig()
        k = sorted(mods)[0]
        mods[k] = "0" * 16
        return mods

    monkeypatch.setattr(wh, "module_hashes", tampered)
    bad = wh.violations()
    assert any("engine module changed" in v for v in bad), bad


def test_guard_ignores_in_window_edit(monkeypatch):
    """An edited query that IS queued in the window is not a violation
    — that is the acknowledgment path."""
    victim = wh.window_names()[0]
    _orig = wh.current_hashes

    def tampered():
        now = _orig()
        now[victim] = "0" * 16
        return now

    monkeypatch.setattr(wh, "current_hashes", tampered)
    assert not [v for v in wh.violations() if victim in v]
