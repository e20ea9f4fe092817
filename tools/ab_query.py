#!/usr/bin/env python3
"""Same-day interleaved two-tree A/B for ONE query (round 13).

Generalizes tools/ab_g05.py: one fresh 64g JVM per (tree, rep), the
ladder's sf10 methodology, running graft.Verify for a single query
from an OLD worktree's compiled classes and the current tree's.
Per-rep walls + in-row contention probes land in the given artifact
under arms <query-prefix>_old / <query-prefix>_new, each tagged with
its `adjudication` (r12 verdict item 4: growth files must say per-arm
whether the reading is hash-gated or rows-only):

  - the FIRST "new" rep's output is oracle-checked via tools/check.py
    (DuckDB replay) -> adjudication "hash" on pass, "rows_only" + a
    loud stderr line otherwise;
  - the "old" arm is the committed r12 boundary, hash-gated by
    CORRECTNESS_r12 -> recorded as "hash (r12 gate)".

Usage: python3 tools/ab_query.py <query> <old_tree> [reps] [sfdir] [artifact]
e.g.:  python3 tools/ab_query.py g01_pagerank /tmp/ab_r12 3 /tmp/sf10 GROWTH_r13.json
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
from ladder import JDK17_ADD_OPENS  # noqa: E402


def run_once(tree, vdir, sf_dir, query):
    subprocess.run(["rm", "-rf", vdir])
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    cmd = (["java"] + JDK17_ADD_OPENS +
           ["-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC", "-Xmx64g",
            "-cp", f"{tree}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Verify", sf_dir, vdir, query])
    subprocess.run(cmd, cwd=REPO, check=True, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    t = json.loads(Path(vdir, "timings.json").read_text())
    c = json.loads(Path(vdir, "calibration.json").read_text())
    return t[query], round(c["par_over_scalar"], 3)


def oracle_check(vdir, sf_dir, query):
    rep = Path(vdir) / "report.json"
    r = subprocess.run(
        ["python3", str(REPO / "tools/check.py"), vdir, sf_dir,
         "--json", str(rep), "--only", query], cwd=REPO)
    if r.returncode != 0:
        return False
    res = json.loads(rep.read_text())
    return bool(res.get(query, {}).get("pass"))


def main():
    query = sys.argv[1]
    old_tree = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/sf10"
    out_path = REPO / (sys.argv[5] if len(sys.argv) > 5
                       else "GROWTH_r13.json")
    prefix = query.split("_")[0]
    trees = {f"{prefix}_old": old_tree, f"{prefix}_new": str(REPO)}

    artifact = (json.loads(out_path.read_text()) if out_path.exists()
                else {"round": 13, "generated_by": "tools/ab_query.py"})
    artifact.setdefault("arms", {})
    artifact["reps"] = reps

    # hash-gate the NEW tree's output once, before any timing rep, so a
    # wrong-answer rebuild can never produce a quotable speedup
    vdir0 = f"/tmp/ab_{prefix}_gate"
    run_once(str(REPO), vdir0, sf_dir, query)
    new_adj = "hash" if oracle_check(vdir0, sf_dir, query) else "rows_only"
    if new_adj != "hash":
        print(f"[ab_query] WARNING: {query} new-tree output failed the "
              "DuckDB replay - arm recorded rows_only", file=sys.stderr)

    walls, probes = {}, {}
    for rep in range(reps):
        for tag, tree in trees.items():
            w, p = run_once(tree, f"/tmp/ab_{tag}", sf_dir, query)
            walls.setdefault(tag, []).append(w)
            probes.setdefault(tag, []).append(p)
            print(f"[ab_query] {tag} rep{rep}: {w:.1f}s par/scalar {p}",
                  flush=True)
            ws = sorted(walls[tag])
            artifact["arms"][tag] = {
                "query": query, "cpus": 8, "driver_mem": "64g",
                "dir": sf_dir, "tree": tree,
                "shuffle_partitions": "data-derived",
                "walls_sec": walls[tag], "min_sec": ws[0],
                "median_sec": ws[len(ws) // 2],
                "par_over_scalar_all": probes[tag],
                # the old tree is a committed round boundary whose output
                # that round's CORRECTNESS gate hashed; name the round
                # from the tree path (round 14: /tmp/ab_r13 arms were
                # being stamped "r12 gate")
                "adjudication": (
                    "hash (%s gate)" % (Path(tree).name
                                        .removeprefix("ab_") or "old")
                    if tag.endswith("_old") else new_adj),
            }
            out_path.write_text(json.dumps(artifact, indent=1,
                                           sort_keys=True))
    print("[ab_query] done")


if __name__ == "__main__":
    main()
