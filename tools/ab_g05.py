#!/usr/bin/env python3
"""Round-12 g05 k-core A/B: r11 peel loop vs the adaptive rebuild.

Interleaves one fresh 64g JVM per (tree, rep) — the ladder's sf10
methodology — running graft.Verify for g05_kcore only, from the r11
worktree's classes (arm "old") and the current tree's (arm "new").
Per-rep walls + in-row contention probes land in GROWTH_r12.json under
arm tags g05_old / g05_new.

Usage: python3 tools/ab_g05.py [reps] [sfdir]
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
from ladder import JDK17_ADD_OPENS  # noqa: E402

TREES = {"g05_old": "/tmp/ab_r11", "g05_new": str(REPO)}


def run_once(tree, vdir, sf_dir):
    subprocess.run(["rm", "-rf", vdir])
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    cmd = (["java"] + JDK17_ADD_OPENS +
           ["-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC", "-Xmx64g",
            "-cp", f"{tree}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Verify", sf_dir, vdir, "g05_kcore"])
    subprocess.run(cmd, cwd=REPO, check=True, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    t = json.loads(Path(vdir, "timings.json").read_text())
    c = json.loads(Path(vdir, "calibration.json").read_text())
    return t["g05_kcore"], round(c["par_over_scalar"], 3)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10"
    out_path = REPO / "GROWTH_r12.json"
    artifact = (json.loads(out_path.read_text()) if out_path.exists()
                else {"round": 12, "generated_by": "tools/ab_g05.py"})
    # tolerate a pre-existing file written by another tool (no 'arms'
    # key), and refresh 'reps' on every run instead of only at creation
    artifact.setdefault("arms", {})
    artifact["reps"] = reps
    walls = {}
    probes = {}
    for rep in range(reps):
        for tag, tree in TREES.items():
            w, p = run_once(tree, f"/tmp/abg05_{tag}", sf_dir)
            walls.setdefault(tag, []).append(w)
            probes.setdefault(tag, []).append(p)
            print(f"[ab_g05] {tag} rep{rep}: {w:.1f}s par/scalar {p}",
                  flush=True)
            ws = sorted(walls[tag])
            artifact["arms"][tag] = {
                "query": "g05_kcore", "cpus": 8, "driver_mem": "64g",
                "dir": sf_dir, "tree": tree,
                "shuffle_partitions": "data-derived",
                "walls_sec": walls[tag], "min_sec": ws[0],
                "median_sec": ws[len(ws) // 2],
                "par_over_scalar_all": probes[tag],
            }
            out_path.write_text(json.dumps(artifact, indent=1,
                                           sort_keys=True))
    print("[ab_g05] done")


if __name__ == "__main__":
    main()
