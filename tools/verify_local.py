#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle correctness gate.

NOT part of the engine (the engine is pure Scala/Spark). This replays what
the driver does each round: run graft.Verify at a scale factor, load each
query's parquet result, run the corresponding oracle SQL in DuckDB over the
same test tables, and compare schema + values exactly.

Usage: python3 tools/verify_local.py [sfDir] [outDir]
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(cols):
    """cols: dict name -> list of values. Sort columns by name (driver rule),
    emit row tuples in result order."""
    names = sorted(cols.keys())
    n = len(cols[names[0]]) if names else 0
    rows = [tuple(canon(cols[c][i]) for c in names) for i in range(n)]
    return names, rows


def spark_result(name):
    import glob
    files = sorted(glob.glob(f"{OUT_DIR}/{name}/*.parquet"))
    if not files:
        return None, None
    # Read ALL part files: comparing only files[0] would silently pass on a
    # partial result if Verify ever stopped coalescing to one file.
    t = pq.read_table(files)
    types = {c: str(t.schema.field(c).type) for c in t.column_names}
    return {c: t.column(c).to_pylist() for c in t.column_names}, types


def type_class(t):
    """Coarse arrow-type class: catches engine-vs-oracle typing drift (the
    HUGEINT->float64 pivot case) without false-alarming on representation
    details (string vs large_string, int32 vs int64 literals)."""
    t = str(t)
    for cls, prefixes in [
        ("int", ("int", "uint")), ("float", ("float", "double", "halffloat")),
        ("decimal", ("decimal",)), ("str", ("string", "large_string", "utf8")),
        ("bool", ("bool",)), ("ts", ("timestamp",)), ("date", ("date",)),
        ("bin", ("binary", "large_binary", "fixed_size_binary")),
        ("list", ("list", "large_list", "fixed_size_list")),
        ("struct", ("struct",)),
    ]:
        if t.startswith(prefixes):
            return cls
    return t


def main():
    with open(f"{OUT_DIR}/oracle_sql.json") as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    import os
    results = {}
    # Driver-schema record per query (round-13 verdict #1): the exact shape
    # the driver writes to CORRECTNESS_r{N}.json — rows_match / schema_match
    # / hash_match / spark_rows / oracle_rows / err — so when the driver's
    # own file ships empty (r9, r12, r13: a driver-side handoff fault, the
    # Verify wall has 47-79% headroom), the committed mirror substitutes a
    # same-shape artifact produced on the same tree.
    driver_schema = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        driver_schema[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    names = sorted(d for d in os.listdir(OUT_DIR)
                   if os.path.isdir(os.path.join(OUT_DIR, d)))
    for name in names:
        got, got_types = spark_result(name)
        if got is None:
            results[name] = "SPARK_EMPTY_OR_FAILED"
            record(name, False, False, False, 0, 0, "spark result missing")
            continue
        if name not in oracle:
            n = len(next(iter(got.values()))) if got else 0
            results[name] = f"rows-only ({n} rows)"
            record(name, n > 0, True, True, n, n,
                   None if n > 0 else "rows-only check: 0 rows")
            continue
        try:
            cur = con.execute(oracle[name])
            t = cur.fetch_arrow_table()
            exp = {c: t.column(c).to_pylist() for c in t.column_names}
            exp_types = {c: str(t.schema.field(c).type) for c in t.column_names}
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            record(name, False, False, False,
                   len(next(iter(got.values()))) if got else 0, 0,
                   f"oracle sql error: {e}")
            continue
        gn, gr = frame_fingerprint(got)
        en, er = frame_fingerprint(exp)
        gt = {c: type_class(got_types[c]) for c in got_types}
        et = {c: type_class(exp_types[c]) for c in exp_types}
        record(name, len(gr) == len(er), gn == en,
               gn == en and gt == et and gr == er, len(gr), len(er), None)
        if gn != en:
            results[name] = f"SCHEMA_MISMATCH spark={gn} duckdb={en}"
        elif gt != et:
            results[name] = (f"TYPE_MISMATCH "
                             f"{ {c: (gt[c], et.get(c)) for c in gt if gt[c] != et.get(c)} }")
        elif len(gr) != len(er):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(gr)} duckdb={len(er)}"
        elif gr != er:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            results[name] = f"VALUE_MISMATCH first_diffs={diffs}"
        else:
            results[name] = f"OK ({len(gr)} rows)"

    ok = sum(1 for v in results.values() if v.startswith("OK") or v.startswith("rows-only"))
    for k in sorted(results):
        flag = "  " if results[k].startswith(("OK", "rows-only")) else "!!"
        print(f"{flag} {k}: {results[k]}")
    print(f"\n{ok}/{len(results)} pass")
    # Wall-clock budget gate (round-12 verdict #1): the driver kills Verify
    # at ~570 s. Two-level gate (round-13 ADVICE — the old comment promised
    # 20% headroom that only held at the default budget): HARD-FAIL when
    # the wall exceeds 80% of the driver timeout regardless of what
    # SPARK_GRAFT_VERIFY_BUDGET_SEC is set to, and also when it exceeds the
    # configured budget (default 450 s, itself ~79% of the timeout).
    DRIVER_TIMEOUT_SEC = 570
    mpath = os.path.join(OUT_DIR, "manifest.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        if not m.get("subset_mode") and "wall_sec" in m:
            budget = m.get("budget_sec", 450)
            hard = min(budget, 0.8 * DRIVER_TIMEOUT_SEC)
            if m["wall_sec"] > hard:
                print(f"!! VERIFY WALL BUDGET EXCEEDED: {m['wall_sec']}s > "
                      f"{hard:.0f}s (min of budget {budget}s and 80% of the "
                      f"~{DRIVER_TIMEOUT_SEC}s driver timeout) — trim query "
                      f"cost or raise SPARK_GRAFT_VERIFY_PAR")
                sys.exit(2)
            print(f"verify wall {m['wall_sec']}s within budget "
                  f"{hard:.0f}s (par {m.get('parallelism', 1)}, "
                  f"master {m.get('master', '?')})")
    # Committed-mirror artifact (round-9 verdict #1b): optional 3rd arg is a
    # JSON path; the round session commits this as CORRECTNESS_LOCAL_r{N}.json
    # so an empty driver-side CORRECTNESS file is attributable from the repo
    # alone. Shape mirrors the driver's per-query map plus a manifest echo.
    if len(sys.argv) > 3:
        manifest = None
        mpath = os.path.join(OUT_DIR, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                manifest = json.load(f)
                manifest.pop("per_query", None)  # keep the mirror compact
        with open(sys.argv[3], "w") as f:
            json.dump({"sf_dir": SF_DIR, "out_dir": OUT_DIR,
                       "pass": ok, "total": len(results),
                       "results": {k: results[k] for k in sorted(results)},
                       "verify_manifest": manifest}, f, indent=1)
    # Optional 5th arg: the driver-schema mirror (round-13 verdict #1),
    # byte-compatible with the driver's own CORRECTNESS_r{N}.json layout
    # (compare CORRECTNESS_r11.json) — the round session commits this as
    # CORRECTNESS_MIRROR_r{N}.json so an empty driver file is fully
    # substituted by a same-shape artifact from the same tree.
    if len(sys.argv) > 4:
        with open(sys.argv[4], "w") as f:
            json.dump({k: driver_schema[k] for k in sorted(driver_schema)},
                      f, indent=2)
    sys.exit(0 if ok == len(results) else 1)


if __name__ == "__main__":
    main()
