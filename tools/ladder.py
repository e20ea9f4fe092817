#!/usr/bin/env python3
"""Scale-ladder artifact generator → LADDER_r{N}.json.

Makes the repo's strongest scale claim — designs re-gated (and twice
killed) on a 10x ladder — verifiable without /tmp archaeology: one
committed artifact with per-query hash-pass + wall seconds at each
rung.

Rungs:
  sf0.01 — ALL registered queries (the driver's own gate scale)
  sf0.1  — bench ∪ iterative ∪ heavy groups (Verify's @bench set)
  sf1    — same subset, on the 10x key-shifted replica fixture
           (built by tools/make_sf1.py into /tmp/sf1 if absent)

The sf0.1/sf1 rungs run the bench subset, not the full suite, because
the bounded-by-design DuckDB ORACLES of a few instrument queries (the
adjudicated quadratic yardsticks) dominate wall time at 10x — the
SPARK side is what the ladder exists to falsify, and the bench groups
are its headline surfaces.

Usage: python3 tools/ladder.py <round_number> [out.json]
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF1 = "/tmp/sf1"


def run_verify(sf_dir, out_dir, subset=None, cpus="8"):
    cmd = f"runMain graft.Verify {sf_dir} {out_dir}"
    if subset:
        cmd += f" {subset}"
    subprocess.run(["sbt", "-batch", cmd], cwd=REPO, check=True,
                   env=dict(os.environ, SPARK_GRAFT_CPUS=cpus))


def run_check(out_dir, sf_dir):
    rep = Path(out_dir) / "report.json"
    r = subprocess.run(
        ["python3", str(REPO / "tools/check.py"), out_dir, sf_dir,
         "--json", str(rep)], cwd=REPO)
    results = json.loads(rep.read_text())
    timings = json.loads((Path(out_dir) / "timings.json").read_text())
    return {
        q: {"pass": v["pass"], "rows": v["rows"],
            "wall_sec": timings.get(q)}
        for q, v in results.items()
    }, r.returncode


def main():
    rnd = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"LADDER_r{rnd}.json"
    if not Path(SF1, "lineitem.parquet").exists():
        print("[ladder] building sf1 fixture via make_sf1.py ...")
        subprocess.run(["python3", str(REPO / "tools/make_sf1.py"),
                        "/root/testdata/sf0.1", SF1], check=True)
    rungs = {}
    failed = False
    for sf_dir, subset, label in [
            ("/root/testdata/sf0.01", None, "sf0.01"),
            ("/root/testdata/sf0.1", "@bench", "sf0.1"),
            (SF1, "@bench", "sf1")]:
        print(f"[ladder] rung {label}: verify ...")
        vdir = f"/tmp/ladder_{label}"
        t0 = time.time()
        run_verify(sf_dir, vdir, subset)
        print(f"[ladder] rung {label}: oracle compare ...")
        results, rc = run_check(vdir, sf_dir)
        failed = failed or rc != 0
        rungs[label] = {
            "dir": sf_dir,
            "queries": "all" if subset is None else "bench+iter+heavy",
            "n_pass": sum(1 for v in results.values() if v["pass"]),
            "n_fail": sum(1 for v in results.values()
                          if v["pass"] is False),
            "verify_wall_sec": round(time.time() - t0, 1),
            "results": results,
        }
    artifact = {"round": int(rnd), "generated_by": "tools/ladder.py",
                "rungs": rungs}
    Path(REPO / out).write_text(json.dumps(artifact, indent=1,
                                           sort_keys=True))
    print(f"[ladder] wrote {out}: " + ", ".join(
        f"{k} {v['n_pass']}p/{v['n_fail']}f" for k, v in rungs.items()))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
