#!/usr/bin/env python3
"""Min-of-N layout experiment at the sf10 rung → GROWTH_r{N}.json.

The sf10 ladder walls are single readings with a measured ±2x
run-to-run spread (SCALE.md's dagger caveat), so the round-9 layout
finding (g10: 546.6 s at the default cpus-tied 8 shuffle partitions
vs 330.6 s at 64) needs repeats before it can be read as a growth
statement. This runs each (query, partitions) arm N times in fresh
JVMs — the same one-JVM-per-query methodology as the ladder's sf10
rung — and commits min/median/all walls per arm.

Usage: python3 tools/growth_exp.py <round> [reps] [out.json]
                                   [--arms tag=query:parts,...]
                                   [--dir /tmp/sf1]
Default arms are in ARMS below; --arms overrides them (parts "def"
= leave the knob unset, i.e. shuffle partitions follow cpus). The
artifact is merged arm-by-arm into an existing out.json so the
experiment can be extended across runs without losing readings.
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF10 = "/tmp/sf10"

# (tag, query, shuffle_partitions_or_None_for_default[, extra_env])
# round 10: parts=None now means Verify's DATA-DERIVED default
# (max(cpus, ceil(4 x bytes / 128 MB)) -> 75 at sf10), not cpus-tied 8
ARMS = [
    ("g10_dual_def", "g10_hits", None),
    ("g10_single_def", "g10_hits", None,
     {"SPARK_GRAFT_HITS_SINGLE_PIN": "1"}),
    ("g01_def", "g01_pagerank", None),
    ("d06_def", "d06_dup_clusters", None),
    ("g05_def", "g05_kcore", None),
    ("g08_def", "g08_sssp", None),
    ("d02_def", "d02_ngram_jaccard", None),
    ("d03_def", "d03_minhash_lsh", None),
]


def run_once(query, parts, out_dir, sf_dir=SF10, extra_env=None):
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", SPARK_DRIVER_MEM="64g")
    if parts:
        env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = parts
    if extra_env:
        env.update(extra_env)
    t0 = time.time()
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir} {query}"],
        cwd=REPO, check=True, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    wall = round(time.time() - t0, 1)
    timings = json.loads(Path(out_dir, "timings.json").read_text())
    return timings[query], wall


def parse_arms(spec):
    # tag=query:parts[:KEY=VAL] - parts "def" leaves the knob unset
    # (Verify's data-derived default); an optional trailing KEY=VAL is
    # passed into the arm's environment (e.g. the g10 single-pin knob)
    arms = []
    for item in spec.split(","):
        tag, rhs = item.split("=", 1)
        fields = rhs.split(":")
        query, parts = fields[0], fields[1]
        extra = None
        if len(fields) > 2:
            k, v = fields[2].split("=", 1)
            extra = {k: v}
        arms.append((tag, query, None if parts == "def" else parts, extra))
    return arms


def main():
    argv = list(sys.argv[1:])
    arm_list = ARMS
    if "--arms" in argv:
        i = argv.index("--arms")
        arm_list = parse_arms(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = SF10
    if "--dir" in argv:
        i = argv.index("--dir")
        sf_dir = argv[i + 1]
        del argv[i:i + 2]
    rnd = argv[0]
    reps = int(argv[1]) if len(argv) > 1 else 3
    out = argv[2] if len(argv) > 2 else f"GROWTH_r{rnd}.json"
    out_path = REPO / out
    arms = (json.loads(out_path.read_text())["arms"]
            if out_path.exists() else {})
    for arm in arm_list:
        tag, query, parts = arm[0], arm[1], arm[2]
        extra_env = arm[3] if len(arm) > 3 else None
        walls = []
        for rep in range(reps):
            odir = f"/tmp/growth_{tag}_rep{rep}"
            w, total = run_once(query, parts, odir, sf_dir, extra_env)
            walls.append(w)
            print(f"[growth] {tag} rep{rep}: query {w:.1f}s "
                  f"(jvm total {total:.1f}s)", flush=True)
        walls_sorted = sorted(walls)
        arms[tag] = {
            "query": query, "cpus": 8,
            "shuffle_partitions": int(parts) if parts else "data-derived",
            "extra_env": extra_env,
            "driver_mem": "64g", "dir": sf_dir,
            "walls_sec": walls, "min_sec": walls_sorted[0],
            "median_sec": walls_sorted[len(walls_sorted) // 2],
        }
        out_path.write_text(json.dumps(
            {"round": int(rnd), "generated_by": "tools/growth_exp.py",
             "reps": reps, "arms": arms}, indent=1, sort_keys=True))
    print(f"[growth] wrote {out}")


if __name__ == "__main__":
    main()
