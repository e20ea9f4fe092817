#!/usr/bin/env python3
"""Post-hoc oracle adjudication for growth_exp arms (round 14).

growth_exp.py measures walls but does not hash-gate; r12/r13 doctrine
is that every GROWTH arm must carry a per-arm `adjudication` field
saying whether its reading is hash-gated or rows-only-by-decision.
This replays the DuckDB oracle (tools/check.py) against one rep's
surviving Verify output dir per arm and writes the verdict into the
artifact:

  - "hash"                    — check.py pass on the arm's output
  - "FAILED-ORACLE"           — check.py ran and mismatched (loud; a
                                correctness finding, not a perf note)
  - "rows_only (<reason>)"    — arm listed in --rows-only; the sf30
                                DuckDB marathons (CC / PageRank / HITS
                                unrolls over 352M-row edge tables) are
                                excluded by decision, citing the sf10
                                rung that hash-gates the same query
                                every round.

Usage: python3 tools/adjudicate_growth.py GROWTH_r14.json \
         --arms g05_sf30,d03_sf30,s20_sf30 \
         --rows-only g01_sf30=sf10-rung-hash-gated,d06_sf30=...
"""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def adjudicate(tag, arm):
    vdir = Path(f"/tmp/growth_{tag}_rep0")
    if not (vdir / "timings.json").exists():
        # rep1 overwrote nothing (per-rep dirs); rep0 should exist.
        # Fall back to rep1 if rep0's dir was cleaned.
        alt = Path(f"/tmp/growth_{tag}_rep1")
        if (alt / "timings.json").exists():
            vdir = alt
        else:
            return "NO-OUTPUT"
    rep = vdir / "adjudication_report.json"
    r = subprocess.run(
        ["python3", str(REPO / "tools/check.py"), str(vdir), arm["dir"],
         "--json", str(rep), "--only", arm["query"]], cwd=REPO)
    if r.returncode != 0:
        return "FAILED-ORACLE"
    res = json.loads(rep.read_text())
    return "hash" if res.get(arm["query"], {}).get("pass") \
        else "FAILED-ORACLE"


def main():
    art_path = REPO / sys.argv[1]
    argv = sys.argv[2:]
    arms_to_check, rows_only = [], {}
    if "--arms" in argv:
        arms_to_check = argv[argv.index("--arms") + 1].split(",")
    if "--rows-only" in argv:
        for item in argv[argv.index("--rows-only") + 1].split(","):
            tag, reason = item.split("=", 1)
            rows_only[tag] = reason
    # re-read + write PER ARM: a DuckDB replay at sf30 can run tens of
    # minutes and may be killed mid-list (r14: the d06 marathon) — a
    # single end-of-run write would lose every verdict already earned
    # AND clobber concurrent edits to other arms
    for tag in arms_to_check:
        art = json.loads(art_path.read_text())
        arm = art["arms"][tag]
        verdict = adjudicate(tag, arm)
        arm["adjudication"] = verdict
        print(f"[adjudicate] {tag}: {verdict}", flush=True)
        art_path.write_text(json.dumps(art, indent=1, sort_keys=True))
    art = json.loads(art_path.read_text())
    for tag, reason in rows_only.items():
        if tag in art["arms"]:
            art["arms"][tag]["adjudication"] = f"rows_only ({reason})"
            print(f"[adjudicate] {tag}: rows_only ({reason})")
    art_path.write_text(json.dumps(art, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
