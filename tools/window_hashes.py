"""Machine-enforced catalog churn rule: any query whose (source,
oracle) changed after the driver window that proved it must re-enter
the NEXT window — otherwise its green CORRECTNESS row silently
describes code that no longer exists (the r5 media/mixture staleness).

``tools/checked_hashes.json`` records, per query, the hash of the
shape the driver's window is about to prove (updated for IN-WINDOW
queries only, right before each round's final commit). The check —
run by ``tests/test_window_guard.py`` on every pytest run — flags any
query whose current hash differs from its recorded one but is NOT in
the current first-50 window.

Scope note: the hash covers the query function's own source plus its
oracle SQL (which inlines most operator constants via the f-string
generators). A behavior change made purely inside a shared operator
module does NOT move the hash — those must be queued by hand, as r6
did for the two jaccard-fallback consumers.

Usage:
    python tools/window_hashes.py            # check (exit 1 on violations)
    python tools/window_hashes.py --update   # refresh in-window entries
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HASHES_PATH = os.path.join(ROOT, "tools", "checked_hashes.json")
WINDOW = 50


def current_hashes() -> dict[str, str]:
    import __spark_entry__ as entrymod

    osql = entrymod.oracle_sql()
    out = {}
    for name, fn in entrymod.queries().items():
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):  # builtins / dynamically-built
            src = getattr(fn, "__module__", "") + repr(fn)
        key = src + "\x00" + osql.get(name, "")
        out[name] = hashlib.sha256(key.encode()).hexdigest()[:16]
    return out


def window_names() -> list[str]:
    import __spark_entry__ as entrymod

    return list(entrymod.queries())[:WINDOW]


def violations() -> list[str]:
    """Queries that changed (or appeared) since their recorded window
    but are NOT in the current window — each one is a future stale row."""
    if not os.path.exists(HASHES_PATH):
        return ["tools/checked_hashes.json missing — run --update"]
    with open(HASHES_PATH) as f:
        recorded = json.load(f)
    now = current_hashes()
    window = set(window_names())
    out = []
    for name, h in now.items():
        if name in window:
            continue  # this round's window will prove the current shape
        if name not in recorded:
            out.append(f"{name}: NEW query outside the first-{WINDOW} window")
        elif recorded[name] != h:
            out.append(
                f"{name}: source/oracle changed since its driver window "
                f"but it is not in the current first-{WINDOW} window"
            )
    return out


def update() -> None:
    """Record the current hash for every IN-WINDOW query (they are the
    ones this round's driver run will prove); keep out-of-window
    entries untouched; drop entries for deleted queries."""
    recorded = {}
    if os.path.exists(HASHES_PATH):
        with open(HASHES_PATH) as f:
            recorded = json.load(f)
    now = current_hashes()
    for name in window_names():
        recorded[name] = now[name]
    recorded = {n: h for n, h in recorded.items() if n in now}
    with open(HASHES_PATH, "w") as f:
        json.dump(recorded, f, indent=0, sort_keys=True)
        f.write("\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    args = ap.parse_args()
    if args.update:
        update()
        print(f"recorded {len(window_names())} in-window hashes")
        return 0
    bad = violations()
    for v in bad:
        print(v)
    print(f"window guard: {'OK' if not bad else f'{len(bad)} violation(s)'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
