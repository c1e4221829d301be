"""Compute the next round's registry ordering mechanically.

The driver's correctness gate verifies the FIRST 50 registrations, and
the registry policy (plans/queries.py docstring) says: flagship views,
then never-checked / changed specs, then every spec whose newest green
row is ≥2 rounds old, then the freshest evidence at 51+.  Doing that
by hand each round invites staleness mistakes; this tool derives it
from the committed CORRECTNESS_r*.json artifacts.

Usage: python tools/rotate_registry.py
Prints, in order: the flagships, the never-checked specs, the stale
backlog (oldest evidence first), then the fresh remainder — with the
round each spec was last green, and a warning if the mandatory set
(flagships + never-checked + stale) overflows the 50-slot window.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
sys.path.insert(0, _REPO)

FLAGSHIPS = ["v_order_summary", "v_delivery_performance"]
WINDOW = 50


def last_green() -> dict[str, int]:
    """spec -> newest round with a hash-green row."""
    out: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(p))
        try:
            with open(p) as f:
                data = json.load(f)
        except Exception:
            continue
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                out[name] = max(out.get(name, 0), int(m.group(1)))
    return out


def main() -> None:
    from data_engineering_for_e_commerce_logistics_spark.plans.registry import (
        all_specs,
    )

    specs = all_specs()
    green = last_green()
    if not green:
        sys.exit(
            "no parseable CORRECTNESS_r*.json artifacts found — "
            "nothing to rotate against (run from the repo root?)"
        )
    newest = max(green.values())
    oracle = [n for n, s in specs.items() if s.oracle is not None]
    rows_only = [n for n, s in specs.items() if s.oracle is None]

    never = [n for n in oracle if n not in green and n not in FLAGSHIPS]
    stale = sorted(
        (n for n in oracle
         if n in green and green[n] < newest and n not in FLAGSHIPS),
        key=lambda n: (green[n], n),
    )
    fresh = [
        n for n in oracle
        if green.get(n) == newest and n not in FLAGSHIPS
    ]

    mandatory = len(FLAGSHIPS) + len(never) + len(stale)
    print(f"# newest CORRECTNESS round: r{newest:02d}")
    print(f"# mandatory window load: {mandatory}/{WINDOW}"
          + ("  !! OVERFLOW — split the stale backlog across rounds"
             if mandatory > WINDOW else ""))
    print("# --- 1-2: flagships")
    for n in FLAGSHIPS:
        print(f"{n}  (last green r{green.get(n, 0):02d})")
    print(f"# --- never-checked ({len(never)}) — MUST be in-window")
    for n in never:
        print(n)
    print(f"# --- stale backlog ({len(stale)}) — oldest first")
    for n in stale:
        print(f"{n}  (last green r{green[n]:02d})")
    print(f"# --- fresh remainder ({len(fresh)}) — positions 51+")
    for n in fresh:
        print(n)
    print(f"# --- rows-only last ({len(rows_only)})")
    for n in rows_only:
        print(n)


if __name__ == "__main__":
    main()
