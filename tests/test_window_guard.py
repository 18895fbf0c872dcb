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
    # The catalog's plan columns must AGREE with PLANS.md (r8 ADVICE:
    # a hand-edited CATALOG.md shipped '?' plan columns and a stale
    # shuffle count for a file whose header says it is generated).
    import re as _re

    plan_cols: dict[str, tuple[str, str]] = {}
    for line in plans.splitlines():
        m = _re.match(
            r"\| (\S+) \| (\d+) \| (\d+) \| (\d+) \| (\S+) \| (\d+) \|", line
        )
        if m:
            plan_cols[m.group(1)] = (m.group(4), m.group(6))
    stale = []
    compared = 0
    for line in catalog.splitlines():
        m = _re.match(r"\| \S+ \| `(\S+)` \| .* \| (\S+) \| (\S+) \|$", line)
        if m and m.group(1) in plan_cols:
            compared += 1
            if (m.group(2), m.group(3)) != plan_cols[m.group(1)]:
                stale.append(m.group(1))
    assert not stale, (
        f"CATALOG.md plan columns disagree with PLANS.md: {stale[:5]} — "
        "run tools/gen_catalog.py after tools/gen_plans.py"
    )
    # The cross-check itself must not rot (r9 ADVICE): if either
    # table's row format drifts, both regexes stop matching and the
    # stale list above stays empty VACUOUSLY. Pin that every catalog
    # query was actually parsed out of both files and compared.
    assert len(plan_cols) >= len(names), (
        f"PLANS.md row regex matched only {len(plan_cols)} of "
        f"{len(names)} queries — the table format drifted and the "
        "plan-column cross-check went vacuous"
    )
    assert compared >= len(names), (
        f"CATALOG.md row regex matched only {compared} of {len(names)} "
        "queries — the table format drifted and the plan-column "
        "cross-check went vacuous"
    )


def test_r16_rotation_heads_the_window():
    # r16 window invariants (OPTIMIZATION round 2): the consumers of
    # every engine module this round's optimizations touched lead (the
    # DSIR per-row scoring rework, the jaccard_pairs size-carrying
    # pair expansion, the lsh candidate-distinct drop, the streaming
    # state-store derivation), so every reshaped plan gets a fresh
    # driver row; then the oldest freshness rows (r9 vintage, closing
    # the "nothing older than 6 rounds" rule) fill the tail.
    window = wh.window_names()
    consumers = {
        # DSIR family — per-row scoring against the broadcast dense
        # model array; select-kernel probe/total folding.
        "dsir_select", "dsir_importance_weights", "curation_pipeline_run",
        # jaccard_pairs grouped-path rework + same-module re-proofs.
        "dedup_ngram_jaccard", "dedup_jaccard_df_capped",
        "lsh_recall_report", "dedup_minhash_lsh",
        "dedup_incremental_batch",
        # streaming family — input-derived state stores, no-data-batch
        # drop on the inner-join drain.
        "streaming_interval_join", "streaming_incremental_dedup",
        "streaming_tumbling_counts", "streaming_dedup_within_watermark",
        "streaming_stateful_running_totals",
    }
    assert consumers <= set(window[:15])
    # Freshness: the oldest (r9-vintage) rows fill the tail.
    r9_head = {
        "kmv_jaccard_event_types", "layer_format_policy",
        "lm_surprise_filter", "map_functions_props",
        "zorder_cluster_events",
    }
    assert r9_head <= set(window[:50])


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


def test_module_ack_requires_explicit_consumer_declaration(tmp_path, monkeypatch):
    """r6 VERDICT item 3: --update must refuse to refresh a CHANGED
    engine-module hash unless the run declares that module's queued
    consumers (--ack), validates them against the current window, and
    records the declaration under __module_acks__ for audit."""
    import copy
    import json

    import pytest

    # Work on a scratch copy of the record with one module hash
    # back-dated so it reads as "changed".
    with open(wh.HASHES_PATH) as f:
        rec = json.load(f)
    rec = copy.deepcopy(rec)
    mod = sorted(rec[wh.MODULES_KEY])[0]
    rec[wh.MODULES_KEY][mod] = "0" * 16
    scratch = tmp_path / "checked_hashes.json"
    scratch.write_text(json.dumps(rec))
    monkeypatch.setattr(wh, "HASHES_PATH", str(scratch))

    # 1. no ack at all → refused
    with pytest.raises(SystemExit, match="without a consumer"):
        wh.update()
    # 2. ack naming a consumer OUTSIDE the window → refused
    in_window = wh.window_names()[-1]
    not_in_window = next(
        n for n in wh.current_hashes() if n not in wh.window_names()
    )
    with pytest.raises(SystemExit, match="not in the current"):
        wh.update(acks={mod: ([not_in_window], "")})
    # 3. an ack for an UNCHANGED module is a stale declaration → refused
    unchanged = sorted(rec[wh.MODULES_KEY])[1]
    with pytest.raises(SystemExit, match="UNCHANGED"):
        wh.update(
            acks={
                mod: ([in_window], ""),
                unchanged: ([in_window], "stale copy-paste"),
            }
        )
    # 4. valid ack (with its own per-module note) → APPENDED to the
    # module's ack history (overwriting would erase the audit trail
    # when a module is acked twice in one round). Normalize the
    # pre-history single-dict format when counting.
    prior = json.loads(scratch.read_text()).get(wh.ACKS_KEY, {}).get(mod, [])
    before = 1 if isinstance(prior, dict) else len(prior)
    wh.update(acks={mod: ([in_window], "test ack")}, note="fallback")
    saved = json.loads(scratch.read_text())
    history = saved[wh.ACKS_KEY][mod]
    assert isinstance(history, list) and len(history) == before + 1
    assert history[-1]["queued"] == [in_window]
    assert history[-1]["note"] == "test ack"
    assert saved[wh.MODULES_KEY][mod] != "0" * 16


def test_queries_module_helper_edit_trips_the_guard():
    """r7 review finding: shared helpers living at queries_*.py module
    level (sets_cached, _contam_grams, oracle generators) must be
    covered by the module tripwire — the RESIDUAL hash (file minus
    registered query sources) changes when a helper changes, while a
    pure query-body edit leaves the residue untouched."""
    mods = wh.module_hashes()
    qmods = [m for m in mods if os.path.basename(m).startswith("queries")]
    assert qmods, "queries modules missing from the module tripwire"
    # the residual hash must NOT equal the whole-file hash (query
    # sources really are subtracted)
    import hashlib

    target = os.path.join(wh.ROOT, "etl_projects_spark", "queries_llm.py")
    rel = os.path.relpath(target, wh.ROOT)
    with open(target, "rb") as f:
        whole = hashlib.sha256(f.read()).hexdigest()[:16]
    assert mods[rel] != whole


def _artifact_consumers(
    roots: set[str],
    module_prefixes: tuple[str, ...] = ("etl_projects_spark.queries",),
) -> set[str]:
    """Registered catalog queries that reach any of the ``roots``
    artifact readers, DIRECTLY OR THROUGH MODULE-LEVEL HELPERS
    (transitive closure over every loaded module matching
    ``module_prefixes`` — a query calling a wrapper like
    _minhash_pairs counts; r7 review findings: a literal-substring
    scan missed helper-mediated consumers, a hardcoded three-module
    list would miss a wrapper in any other queries module, and regex
    stripping both erased calls inside triple-quoted f-strings and
    kept prose in inline comments). Call names are collected from the
    AST (comments and docstrings are invisible, calls inside
    f-strings are real Call nodes). Callers whose roots can also be
    reached through OPERATOR-module wrappers (e.g.
    dedup.winnow_fingerprints -> positional_shingle_hashes) must
    widen module_prefixes to include "etl_projects_spark.operators" —
    the default keeps the artifact-consumer tests' historical scope
    (their roots live in queries modules)."""
    import ast
    import inspect
    import sys
    import textwrap
    import types

    import __spark_entry__ as entrymod

    def calls(fn) -> set[str]:
        try:
            src = textwrap.dedent(inspect.getsource(fn))
            tree = ast.parse(src)
        except (OSError, TypeError, SyntaxError):
            return set()
        out = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Call):
                f = node.func
                if isinstance(f, ast.Name):
                    out.add(f.id)
                elif isinstance(f, ast.Attribute):
                    out.add(f.attr)
        return out

    # Close the root set over module-level helpers in EVERY loaded
    # queries module (a helper whose body calls a root becomes a root).
    helpers = {}
    for modname, mod in list(sys.modules.items()):
        if not modname.startswith(module_prefixes):
            continue
        for hname, obj in vars(mod).items():
            if isinstance(obj, types.FunctionType) and obj.__module__ == modname:
                helpers.setdefault(hname, set()).update(calls(obj))
    closed = set(roots)
    changed = True
    while changed:
        changed = False
        for hname, callees in helpers.items():
            if hname not in closed and callees & closed:
                closed.add(hname)
                changed = True
    return {
        name
        for name, fn in entrymod.queries().items()
        if calls(fn) & closed
    }


def test_stored_set_consumer_list_matches_call_sites():
    """bench.py warms the shingle-set artifact for STORED_SET_CONSUMERS
    — the list must track the ACTUAL (transitive) sets_cached call
    sites, or a new consumer gets the one-time build billed to its
    timed window. Pair-graph queries reach sets_cached through the
    pairs/components chain and are covered by their own warm-up."""
    from etl_projects_spark.queries_llm import (
        PAIR_GRAPH_CONSUMERS,
        STORED_SET_CONSUMERS,
    )

    callers = _artifact_consumers({"sets_cached"})
    assert set(PAIR_GRAPH_CONSUMERS) <= callers  # chain reaches sets
    direct = callers - set(PAIR_GRAPH_CONSUMERS)
    # dedup_ngram_jaccard deliberately computes sets inline (the timed
    # raw-chain query); everything else that touches the artifact must
    # be in the warm list.
    assert direct == set(STORED_SET_CONSUMERS), (
        direct ^ set(STORED_SET_CONSUMERS)
    )


def test_pair_graph_consumer_list_matches_call_sites():
    """Same single-source-of-truth rule for the pair/component
    artifacts: bench.py's warm list (PAIR_GRAPH_CONSUMERS, now
    exported next to pairs_cached) must equal the transitive callers —
    the bench-local copy had silently missed dedup_keep_best_quality."""
    from etl_projects_spark.queries_llm import PAIR_GRAPH_CONSUMERS

    callers = _artifact_consumers({"pairs_cached", "_components_cached"})
    assert callers == set(PAIR_GRAPH_CONSUMERS), (
        callers ^ set(PAIR_GRAPH_CONSUMERS)
    )


def test_freshness_report_matches_correctness_records():
    """tools/freshness_report.py is the window-composition input: every
    catalog query appears, no proof round exceeds the newest record,
    and queries absent from every record report round 0 (which the
    guard separately forces into the current window)."""
    import freshness_report as fr

    import __spark_entry__ as entrymod

    latest = fr.latest_proof_rounds()
    assert set(latest) == set(entrymod.queries())
    import glob
    import re

    rounds = [
        int(re.search(r"_r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(wh.ROOT, "CORRECTNESS_r*.json"))
    ]
    assert max(latest.values()) <= max(rounds)
    # r7 additions have no row yet -> 0, and they are in the window
    zero = {n for n, r in latest.items() if r == 0}
    assert zero <= set(wh.window_names())


def test_ack_history_hashes_are_real_module_hashes():
    """Every ack-history entry must carry the 16-hex module hash
    captured at ack time — the audit trail exists to map each consumer
    declaration to an exact module state. A hand-edit had replaced two
    entries' hashes with the literal "(superseded)" (r7 ADVICE);
    provenance belongs in the note field, never over the hash."""
    import json
    import re

    import window_hashes as wh

    with open(wh.HASHES_PATH) as f:
        rec = json.load(f)
    for mod, entries in rec.get(wh.ACKS_KEY, {}).items():
        if isinstance(entries, dict):
            entries = [entries]
        for e in entries:
            assert re.fullmatch(r"[0-9a-f]{16}", e["hash"]), (mod, e["hash"])


def test_contam_index_consumer_list_matches_call_sites():
    """Same single-source-of-truth rule for the train-gram index:
    bench.py's warm list (CONTAM_INDEX_CONSUMERS, exported next to
    train_gram_index) must equal the transitive callers — otherwise a
    new decontamination consumer gets the one-time 96%-train gram
    explode+distinct+write billed to its timed window on a cold corpus
    (r7 ADVICE)."""
    from etl_projects_spark.queries_curation import CONTAM_INDEX_CONSUMERS

    callers = _artifact_consumers({"train_gram_index"})
    assert callers == set(CONTAM_INDEX_CONSUMERS), (
        callers ^ set(CONTAM_INDEX_CONSUMERS)
    )


def test_shingle_family_warmup_matches_call_sites():
    """r11 proved the bench warm-up trigger can silently miss a new
    family (the span queries' first reads were billed 2-3x steady
    state because their names missed SHINGLE_FAMILY_PREFIXES). The
    trigger is name-based; this derives the ACTUAL shingle-shaped
    consumers from the AST — every catalog query that (transitively)
    reaches the tokenize/md5/minhash/LSH roots whose first execution
    pays the family's one-time JIT/codegen — and fails until the
    trigger covers each one. A new query using shingle shapes under a
    fresh name now breaks the suite instead of the bench record."""
    import bench

    roots = {
        # tokenize/md5 shingle pipelines (set, positional, oracle CTE)
        "word_shingles", "word_shingle_sets", "positional_shingle_hashes",
        "shingles_cte", "sets_cached",
        # minhash/LSH band shapes
        "minhash_signatures_from_sets", "lsh_candidate_pairs",
        "lsh_cand_cte", "melt_bands",
    }
    # Widened to operator modules (r12 review): queries that reach
    # the roots ONLY through an operators/dedup.py wrapper (e.g.
    # dedup.winnow_fingerprints -> positional_shingle_hashes) must be
    # visible too, or a future wrapper-mediated query under a fresh
    # name slips past this tripwire exactly like the r11 span family
    # slipped past the name prefixes.
    consumers = _artifact_consumers(
        roots,
        ("etl_projects_spark.queries", "etl_projects_spark.operators"),
    )
    assert consumers, "root derivation went vacuous"
    assert "winnow_fingerprints" in consumers, (
        "operator-wrapper closure went vacuous (winnow_fingerprints "
        "reaches the roots only via dedup.winnow_fingerprints)"
    )
    uncovered = sorted(
        n
        for n in consumers
        if not (
            n.startswith(bench.SHINGLE_FAMILY_PREFIXES)
            or n in bench.SHINGLE_FAMILY
        )
    )
    assert not uncovered, (
        f"shingle-shaped queries missing from bench.py's warm-up "
        f"trigger (their first bench read gets billed the family JIT): "
        f"{uncovered}"
    )


def test_lazy_twin_oracles_rekey_to_gate_time_env(monkeypatch):
    """r13 lazy-oracle sweep: every data-derived twin oracle must be
    registered as a CALLABLE and resolve against the
    SPARK_GRAFT_ORACLE_SF_DIR in effect when oracle_sql() RUNS — not
    whatever it said at import (the r12 ADVICE failure mode). The
    corpus-derived constants differ between vintages, so the resolved
    SQL text must differ too."""
    import importlib

    import __spark_entry__ as entrymod
    from etl_projects_spark.queries import ORACLE

    lazy = {n for n, o in ORACLE.items() if callable(o)}
    assert {
        "ann_ivf_recall_report", "ann_ivf_topk",
        "semdedup_prune", "embedding_pca_project",
    } <= lazy, "a data-derived twin oracle regressed to import-time"

    monkeypatch.setenv(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    at_gate = entrymod.oracle_sql()
    monkeypatch.setenv(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001"
    )
    at_other = entrymod.oracle_sql()
    for name in sorted(lazy):
        assert at_gate[name] != at_other[name], (
            f"{name}: lazy oracle did not re-derive for the swept "
            "corpus — its twin constants are frozen"
        )


def test_bench_normalized_summary_attributes_box_state():
    """r13 VERDICT item 3: the bench record must self-attribute box
    swings. A run whose per-query times moved EXACTLY with the calib
    stamps must read delta_pct == 0 (box state, not code); the
    per-query normalization must divide by the MATCHING calib class
    (blas for the Arrow/numpy families, py_st for the JVM rest)."""
    import bench

    timings = {"q1_pricing_summary": 2.0, "ann_knn_join": 1.0}
    calib = {"py_st_s": 0.5, "blas_mt_s": 0.25}
    prior = {
        "calib": {"py_st_s": 0.4, "blas_mt_s": 0.25},
        # q1 recorded on a 1.25x-faster box; ann on an identical box;
        # 'gone' left the catalog and must be ignored.
        "queries": {
            "q1_pricing_summary": 1.6,
            "ann_knn_join": 1.0,
            "gone": 9.9,
        },
    }
    out = bench.normalized_summary(timings, calib, prior)
    assert out["total_s"] == 3.0
    assert out["total_norm_py_st"] == 6.0
    assert out["queries_norm"] == {
        "q1_pricing_summary": 4.0,  # 2.0 / py_st 0.5
        "ann_knn_join": 4.0,  # 1.0 / blas 0.25
    }
    lfl = out["prior_like_for_like"]
    assert lfl["n_shared"] == 2
    assert lfl["delta_pct"] == 0.0
    assert lfl["calib_ratio_py_st"] == 1.25
    # Calib-explained moves are NOT drift (r15, VERDICT item 5).
    assert out["drifted"] == []
    # No prior record (first run / sf change): block simply absent.
    assert "prior_like_for_like" not in bench.normalized_summary(
        timings, calib, None
    )


def test_bench_drift_alarm_fires_on_normalized_regression(monkeypatch):
    """r15 (r14 VERDICT item 5): a query whose NORMALIZED time rose
    >1.5x vs the prior record must land in `drifted` — box-level
    attribution can't hide it — while sub-second queries (run-order
    JIT noise band) stay quiet. r16 (r15 VERDICT item 8): the
    substring_span_incremental band is RETIRED — with the shipped
    EMPTY band table it alarms like any other query; the band
    mechanism itself is exercised via a synthetic entry."""
    import bench

    assert bench._DRIFT_BANDS == {}, (
        "the band table must ship empty (r16 retirement) — a new entry "
        "needs a DETERMINISM.md recipe with a measured cause"
    )
    calib = {"py_st_s": 0.5, "blas_mt_s": 0.25}
    prior = {
        "calib": dict(calib),
        "queries": {
            "q1_pricing_summary": 1.5,  # norm 3.0
            "tfidf_top_terms": 0.3,  # norm 0.6 — sub-second this run
            "substring_span_incremental": 1.75,  # norm 3.5
        },
    }
    timings = {
        "q1_pricing_summary": 3.0,  # norm 6.0 = 2.0x prior -> DRIFT
        "tfidf_top_terms": 0.9,  # 3x prior but raw < 1 s -> quiet
        "substring_span_incremental": 4.0,  # norm 8.0 = 2.3x -> DRIFT
    }
    out = bench.normalized_summary(timings, calib, prior)
    assert {d["name"] for d in out["drifted"]} == {
        "q1_pricing_summary", "substring_span_incremental",
    }
    d = [x for x in out["drifted"] if x["name"] == "q1_pricing_summary"][0]
    assert d["ratio"] == 2.0 and d["norm"] == 6.0 and d["prior_norm"] == 3.0
    # The band mechanism still works for a future documented entry:
    # inside the ceiling it mutes, past the ceiling it alarms.
    monkeypatch.setitem(
        bench._DRIFT_BANDS, "substring_span_incremental", 10.5
    )
    out2 = bench.normalized_summary(timings, calib, prior)
    assert [d["name"] for d in out2["drifted"]] == ["q1_pricing_summary"]
    timings["substring_span_incremental"] = 5.5  # norm 11.0 > 10.5
    out3 = bench.normalized_summary(timings, calib, prior)
    assert {d["name"] for d in out3["drifted"]} == {
        "q1_pricing_summary", "substring_span_incremental",
    }
