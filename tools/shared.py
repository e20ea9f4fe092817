#!/usr/bin/env python3
"""Shared-session sf10 A/B arms → SHARED_r{N}.json.

Round 11 measured the old policy pair and found the counterintuitive
result that KILLED pack-boundary sweeps as a granularity: the no-sweep
arm completed 11/11 at 29.6 GiB peak while the sweep arm OOM'd IN-pack
at g08 (9/11) — eleven engine queries' leftover LineageCut pins
accumulate WITHIN the graph pack, where a boundary sweep never runs.

Round 12 lands the ownership-aware fix (Caches.strayUnpersist: after
every query, drop each LineageCut generation/pin no rotation will
release, never touching pack memos) and this script measures it:

  arm "stray"    — the new default (per-query strayUnpersist +
                   boundary sweeps, SPARK_GRAFT_* unset)
  arm "nostray"  — r11's surviving arm for comparison
                   (SPARK_GRAFT_NO_SWEEP=1 SPARK_GRAFT_NO_STRAY=1:
                   strays left to the ContextCleaner, no sweeps)

Each arm is ONE 64g JVM over the legacy 11-query subset (same as
SHARED_r11 so the artifact is directly comparable), capturing
timings.json / storage.json / calibration.json, plus the oracle
compare so a completed arm is also hash-adjudicated.

Usage: python3 tools/shared.py <round> [arms] [--subset q1,q2,...]
       (arms default "stray,nostray")
"""
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SF10 = "/tmp/sf10"

# SHARED_r11's legacy 11-query subset, verbatim (comparability)
SUBSET = ",".join([
    "d02_ngram_jaccard", "d03_minhash_lsh", "d06_dup_clusters",
    "d18_tfidf_similarity", "d20_entity_blocks",
    "s09_int_kmeans", "s20_ivf_adc_topk",
    "g01_pagerank", "g05_kcore", "g08_sssp", "g10_hits",
])

ARMS = {
    "stray": {},
    "nostray": {"SPARK_GRAFT_NO_SWEEP": "1", "SPARK_GRAFT_NO_STRAY": "1"},
    # the r11 sweep arm (boundary sweeps, no per-query strays) kept
    # for completeness — NOT in the default set: measured OOM-fragile
    # twice (SHARED_r11), superseded by "stray"
    "sweep_only": {"SPARK_GRAFT_NO_STRAY": "1"},
}


def run_arm(name, env_extra, subset):
    vdir = Path(f"/tmp/shared_{name}")
    subprocess.run(["rm", "-rf", str(vdir)])
    vdir.mkdir(parents=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="8",
               SPARK_DRIVER_MEM="64g", **env_extra)
    sys.path.insert(0, str(REPO / "tools"))
    from ladder import JDK17_ADD_OPENS, CLASSES, classes_current
    assert classes_current(), \
        "compile first (sbt -batch compile) — stale classes"
    cmd = (["java"] + JDK17_ADD_OPENS +
           ["-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC", "-Xmx64g",
            "-cp", f"{CLASSES}:/opt/spark/jars/*",
            "graft.Verify", SF10, str(vdir), subset])
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env)
    wall = round(time.time() - t0, 1)
    arm = {"rc": r.returncode, "completed": r.returncode == 0,
           "env": env_extra, "wall_sec": wall}
    for f, key in [("timings.json", "timings_sec"),
                   ("storage.json", "storage"),
                   ("calibration.json", "calibration")]:
        p = vdir / f
        if p.exists():
            arm[key] = json.loads(p.read_text())
    if r.returncode != 0 and "timings_sec" not in arm:
        done = sorted(p.name for p in vdir.iterdir() if p.is_dir())
        arm["completed_queries"] = done
    # oracle-adjudicate a completed arm (rows at sf10 are the same
    # compare the ladder rung runs)
    if r.returncode == 0:
        rep = vdir / "report.json"
        c = subprocess.run(
            ["python3", str(REPO / "tools/check.py"), str(vdir), SF10,
             "--json", str(rep)], cwd=REPO)
        if rep.exists():
            res = json.loads(rep.read_text())
            arm["n_pass"] = sum(1 for v in res.values() if v["pass"])
            arm["n_fail"] = sum(1 for v in res.values()
                                if v["pass"] is False)
    return arm


def main():
    rnd = sys.argv[1]
    argv = list(sys.argv)
    subset = SUBSET
    if "--subset" in argv:
        i = argv.index("--subset")
        subset = argv[i + 1]
        del argv[i:i + 2]
    arms = (argv[2].split(",") if len(argv) > 2 else ["stray", "nostray"])
    out = REPO / f"SHARED_r{rnd}.json"
    artifact = (json.loads(out.read_text()) if out.exists()
                else {"round": int(rnd), "generated_by": "tools/shared.py",
                      "subset": subset, "arms": {}})
    for a in arms:
        print(f"[shared] arm {a} ...")
        artifact["arms"][a] = run_arm(a, ARMS[a], subset)
        out.write_text(json.dumps(artifact, indent=1, sort_keys=True))
        print(f"[shared] arm {a}: rc={artifact['arms'][a]['rc']} "
              f"wall={artifact['arms'][a]['wall_sec']}s")
    print(f"[shared] wrote {out.name}")


if __name__ == "__main__":
    main()
