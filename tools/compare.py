#!/usr/bin/env python3
"""Local pre-verify: mimic the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/v2

Binds each bare table name as a DuckDB view over <sfDir>/<t>.parquet,
runs every oracle_sql.json entry, and compares against the Spark result
parquet written by graft.Verify: columns sorted by name, then row-wise
value compare (exact; floats compared to 9 dp to absorb parquet float
round-trip noise only — real mismatches show up far above that).

This is a builder-side diagnostic tool only (python/duckdb are
driver-side deps, not part of the Scala library).
"""
import json, math, os, sys, time

import duckdb

# Driver-budget early warning (VERDICT r10 #1/#3): round 10's correctness
# artifact came back EMPTY because 15 oracles hit DuckDB 1.0's exponential
# CTE inlining and starved the driver's time budget. graft.Verify now
# rewrites every oracle through Oracles.materialize before dumping
# oracle_sql.json (so this script and the driver both consume the fixed
# texts), but any oracle that still runs slow is a regression waiting to
# zero a round — flag it loudly here so the builder sees it pre-commit.
SLOW_ORACLE_SEC = 3.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        r = round(v, 9)
        # Byte-faithful to the driver's hash: -0.0 == 0.0 numerically but
        # serializes with a different sign bit (r6 shipped ml_lasso_multi
        # red because this compare said PASS while the driver's hash said
        # FAIL). Tag the sign of zero explicitly so it can never hide.
        if r == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return r
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, norm(v[k])) for k in sorted(v))
    return v


def main(sf_dir, out_dir):
    # --json <path>: also write a structured result artifact
    # {"n_pass", "n_fail", "n_total", "fail": [...], "slow": {name: sec}}
    # so a round's local correctness claim is committable/reproducible
    # (ADVICE r10 #5 — NOTES green-count claims need a committed artifact).
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    failed, slow = [], {}
    con = duckdb.connect()
    # NO view binding: oracle_sql.json is self-contained since Verify
    # prepends read_parquet CTEs (pass --bind-views to test the other
    # driver scenario, where bare names resolve to views).
    if "--bind-views" in sys.argv:
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark result dir")
            failed.append(name)
            n_fail += 1
            continue
        try:
            t0 = time.time()
            oracle = con.execute(oracles[name]).fetch_arrow_table().to_pylist()
            dt = time.time() - t0
            if dt > SLOW_ORACLE_SEC:
                slow[name] = round(dt, 1)
                print(f"SLOW {name}: oracle took {dt:.1f}s (> {SLOW_ORACLE_SEC}s "
                      f"driver-budget hazard — see Oracles.materialize)")
            spark = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
            ).fetch_arrow_table().to_pylist()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failed.append(name)
            n_fail += 1
            continue
        if len(oracle) != len(spark):
            print(f"FAIL {name}: rows spark={len(spark)} oracle={len(oracle)}")
            failed.append(name)
            n_fail += 1
            continue
        ok = True
        ocols = sorted(oracle[0].keys()) if oracle else []
        scols = sorted(spark[0].keys()) if spark else []
        if ocols != scols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            failed.append(name)
            n_fail += 1
            continue
        for i, (orow, srow) in enumerate(zip(oracle, spark)):
            ovals = tuple(norm(orow[c]) for c in ocols)
            svals = tuple(norm(srow[c]) for c in ocols)
            if ovals != svals:
                print(f"FAIL {name}: row {i} spark={svals} oracle={ovals}")
                ok = False
                break
        if ok:
            print(f"PASS {name} ({len(spark)} rows)")
            n_pass += 1
        else:
            failed.append(name)
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(oracles)} total")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "n_total": len(oracles), "fail": sorted(failed),
                       "slow": slow}, f, indent=1, sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
