"""One-off scaling probe beyond the gate vintages (r15, r14 VERDICT
item 6): synthesize a 3x-documents corpus from sf0.1 and measure
t(3x)/t(sf0.1) for the heaviest document-family catalog queries,
converting SCALE.md's design arguments into measured curves at least
one scale doubling out.

Corpus synthesis (deterministic, no RNG): three copies of every sf0.1
document —
  copy 0: verbatim;
  copy 1: doc_id + 1e7, TOKEN-REVERSED text;
  copy 2: doc_id + 2e7, DEINTERLEAVED text (even-index tokens then
          odd-index tokens).
Reversal/deinterleave preserve length, vocabulary, and the per-source
distribution, while destroying n-gram/shingle overlap with the
original — a naive duplicate (or a rotation, which keeps most
n-grams) would make every copy a near-dup of its original and inflate
the dedup families' candidate-pair work ~3x beyond what a real corpus
at 3x volume carries, biasing the exponent upward. The 1e7 id offsets
sit far above any real doc_id but inside dsir_select's 2^30
composite-key packing width (1e9 trips its loud guard, by design),
and keep the hash-based splits (mix_unit, eval slices) uniform.

Measurement design (what the first draft got wrong): each (query,
scale) pair runs in its OWN subprocess — a shared session let scoped
pins and JIT order bleed between measurements (substring_span read
21.7 s at sf0.1 in a polluted session vs 3.7 s fresh), and the two
INCREMENTAL queries mutate their persisted artifacts per invocation,
so repeat-timing them measures arrival-state drift, not scale. Per
process: a small session warm-up, then
  - stateless queries: one untimed warm run (builds the per-corpus
    scratch artifacts — corpus-admission cost, excluded from steady
    state exactly like bench.py), then min of two timed runs;
  - incremental queries (substring_span_incremental,
    dedup_incremental_batch): their PRIVATE artifact is deleted and
    ONE cold build+probe run is timed (the bench "notes" convention —
    cold-vs-cold is the comparable number for stateful admission).
Exponent = ln(t3/t1) / ln(3).

Usage:  python tools/upscale_probe.py [--dest DIR] [--names a,b,...]
Writes UPSCALE_PROBE.json at the repo root and prints a markdown
table for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The span/dedup/DSIR heavies (top documents-family rows of the r14
# normalized bench record; streaming/events rows excluded — their
# input is the events table, which this probe does not upscale).
HEAVIES = [
    "substring_span_incremental",
    "dsir_select",
    "decontaminate_eval_join",
    "substring_span_rewrite",
    "substring_span_pairs",
    "dedup_minhash_lsh",
    "substring_span_report",
    "dedup_ngram_jaccard",
    "dedup_incremental_batch",
    "dsir_importance_weights",
]

# Queries whose persisted artifact advances with every invocation —
# cold build+probe is the scale-comparable measurement for these.
INCREMENTAL = {"substring_span_incremental", "dedup_incremental_batch"}


def build_corpus(dest: str) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(dest, "documents.parquet")
    if os.path.exists(out):
        return dest
    os.makedirs(dest, exist_ok=True)
    tbl = pq.read_table(os.path.join(SRC, "documents.parquet"))
    cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    n = len(cols["doc_id"])
    doc_id, text = list(cols["doc_id"]), list(cols["text"])
    other = {
        c: list(v) for c, v in cols.items() if c not in ("doc_id", "text")
    }
    for k, tf in ((1, lambda t: list(reversed(t))),
                  (2, lambda t: t[0::2] + t[1::2])):
        for i in range(n):
            doc_id.append(cols["doc_id"][i] + k * 10**7)
            text.append(" ".join(tf(cols["text"][i].split(" "))))
            for c in other:
                other[c].append(cols[c][i])
    arrays = {"doc_id": pa.array(doc_id, pa.int64()),
              "text": pa.array(text)}
    for c, v in other.items():
        arrays[c] = pa.array(v, tbl.schema.field(c).type)
    pq.write_table(
        pa.table({c: arrays[c] for c in tbl.column_names}),
        out + ".tmp",
    )
    os.replace(out + ".tmp", out)
    return dest


def measure_one(name: str, sf_dir: str) -> None:
    """Subprocess body: print ONE line `MEASURE <seconds>`."""
    from etl_projects_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session(app_name="upscale_probe_measure")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(q: str) -> None:
        qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Session warm-up: one cheap documents-only shape (JIT/codegen/
    # parquet-footer costs land here, not in the measurement; the
    # synthetic corpus dir carries ONLY documents.parquet).
    run("text_quality_score")

    if name in INCREMENTAL:
        from etl_projects_spark.queries_llm import _corpus_scratch

        kind = (
            "lsh"
            if name == "dedup_incremental_batch"
            else "spanidx%d"
            % __import__(
                "etl_projects_spark.queries_wave29", fromlist=["SPAN_N"]
            ).SPAN_N
        )
        shutil.rmtree(_corpus_scratch(sf_dir, kind), ignore_errors=True)
        t0 = time.perf_counter()
        run(name)
        best = time.perf_counter() - t0
    else:
        run(name)  # warm: scratch artifacts, untimed
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(name)
            best = min(best, time.perf_counter() - t0)
    print(f"MEASURE {best:.3f}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default="/tmp/spark_graft_upscale3x")
    ap.add_argument("--names", default=",".join(HEAVIES))
    ap.add_argument("--measure", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--sf-dir", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.measure:
        measure_one(args.measure, args.sf_dir)
        return

    names = [n for n in args.names.split(",") if n]
    big = build_corpus(args.dest)

    def sub(name: str, sf_dir: str) -> float:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--measure", name, "--sf-dir", sf_dir],
            capture_output=True, text=True, cwd=REPO, check=True,
        )
        for line in out.stdout.splitlines():
            if line.startswith("MEASURE "):
                return float(line.split()[1])
        raise RuntimeError(f"no MEASURE line for {name}@{sf_dir}:\n"
                           f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")

    rows = []
    for name in names:
        t1 = sub(name, SRC)
        t3 = sub(name, big)
        exp = math.log(t3 / t1) / math.log(3.0)
        rows.append(
            {
                "name": name,
                "mode": "cold" if name in INCREMENTAL else "steady",
                "t_sf01_s": round(t1, 3),
                "t_3x_s": round(t3, 3),
                "ratio": round(t3 / t1, 2),
                "exponent": round(exp, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    with open(os.path.join(REPO, "UPSCALE_PROBE.json"), "w") as f:
        json.dump({"src": SRC, "copies": 3, "rows": rows}, f, indent=1)
    print("\n| query | mode | t(sf0.1) | t(3x) | ratio | exponent |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| `{r['name']}` | {r['mode']} | {r['t_sf01_s']} s "
            f"| {r['t_3x_s']} s | {r['ratio']}x | {r['exponent']} |"
        )


if __name__ == "__main__":
    main()
