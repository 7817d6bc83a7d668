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
import glob, json, math, os, sys, time

import duckdb
import pyarrow.parquet as papq
import pyarrow.types as pat

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


def type_key(t):
    """Normalize an arrow type for cross-engine schema compare.

    VERDICT r11 root-caused 3 driver-red rows to an output-TYPE defect this
    script couldn't see: DuckDB types sum(BIGINT) as HUGEINT, so the oracle
    emitted decimal128(38,0) where Spark wrote int64 — to_pylist() erased
    the difference while the driver's type-sensitive hash did not. Compare
    arrow schemas with a small widening map: all plain integer widths are
    wire-equal (int32 vs int64 never tripped the driver), but decimal stays
    decimal — the HUGEINT fingerprint must fail loudly here.
    """
    if pat.is_null(t):
        return "*"  # all-NULL column: engine-dependent inference, wildcard
    if pat.is_integer(t):
        return "int"
    if pat.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pat.is_float32(t):
        return "float32"
    if pat.is_floating(t):
        return "float64"
    if pat.is_string(t) or pat.is_large_string(t):
        return "string"
    if pat.is_binary(t) or pat.is_large_binary(t):
        return "binary"
    if pat.is_timestamp(t):
        return "timestamp"
    if pat.is_date(t):
        return "date"
    if pat.is_boolean(t):
        return "bool"
    if pat.is_list(t) or pat.is_large_list(t):
        return f"list<{type_key(t.value_type)}>"
    if pat.is_struct(t):
        inner = ",".join(f"{f.name}:{type_key(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pat.is_map(t):
        return f"map<{type_key(t.key_type)},{type_key(t.item_type)}>"
    return str(t)


def schema_mismatches(oracle_schema, spark_schema):
    """Column-name → (oracle_type, spark_type) for every typed mismatch,
    plus explicit entries for columns present on only one side (ADVICE
    r12 #2: the old name-intersection loop silently skipped them, leaving
    the late value compare to notice — or not, on an empty result)."""
    ot = {f.name: type_key(f.type) for f in oracle_schema}
    st = {f.name: type_key(f.type) for f in spark_schema}
    bad = {}
    for c in ot:
        if c not in st:
            bad[c] = (ot[c], "<missing>")
        elif ot[c] != st[c] and "*" not in (ot[c], st[c]):
            bad[c] = (ot[c], st[c])
    for c in st:
        if c not in ot:
            bad[c] = ("<missing>", st[c])
    return bad


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
            oracle_tbl = con.execute(oracles[name]).fetch_arrow_table()
            dt = time.time() - t0
            if dt > SLOW_ORACLE_SEC:
                slow[name] = round(dt, 1)
                print(f"SLOW {name}: oracle took {dt:.1f}s (> {SLOW_ORACLE_SEC}s "
                      f"driver-budget hazard — see Oracles.materialize)")
            spark_tbl = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
            ).fetch_arrow_table()
            oracle = oracle_tbl.to_pylist()
            spark = spark_tbl.to_pylist()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failed.append(name)
            n_fail += 1
            continue
        # Output-TYPE gate (VERDICT r11 #1): values can be equal while the
        # driver's type-sensitive hash still mismatches (HUGEINT class).
        # The Spark side's schema is read from the parquet FILES with
        # pyarrow directly (ADVICE r12 #2) — routing it through DuckDB's
        # reader first let any type DuckDB normalizes on read (unsigned
        # ints, timestamp unit/tz) pass the gate while the driver's
        # direct type-sensitive hash still differed.
        try:
            spark_files = sorted(glob.glob(os.path.join(spark_dir, "*.parquet")))
            spark_schema = papq.read_schema(spark_files[0]) if spark_files \
                else spark_tbl.schema
        except Exception:
            spark_schema = spark_tbl.schema
        tbad = schema_mismatches(oracle_tbl.schema, spark_schema)
        if tbad:
            print(f"FAIL {name}: output type mismatch "
                  + ", ".join(f"{c}: oracle={o} spark={s}"
                              for c, (o, s) in sorted(tbad.items())))
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
