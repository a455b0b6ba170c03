#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(dumps each query result as parquet + oracle_sql.json), then this script
executes every oracle SQL in DuckDB over the same fixture tables and
compares, sorting columns by name as the driver does.

Usage: python3 tools/check.py <sfDir> <outDir> [--record PATH] [query ...]

--record PATH writes the PASS/FAIL report to PATH ATOMICALLY (temp file
in the same directory + os.replace) in addition to stdout. Use it for
the committed SF1_CHECK_r<N>.txt records instead of a shell `>`
redirect — VERDICT r13: an in-flight redirect zeroed the record just
before the end-of-round snapshot committed it.
"""
import os, sys, json, math, tempfile

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def frame(rel):
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(norm(v) for v in row) for row in df.itertuples(index=False)]
    return cols, rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    record = None
    if "--record" in rest:
        i = rest.index("--record")
        record = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    passed, failed = [], []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            scols, srows = frame(con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"))
        except Exception as e:
            failed.append((name, f"spark result unreadable: {e}"))
            continue
        try:
            dcols, drows = frame(con.sql(sql))
        except Exception as e:
            failed.append((name, f"oracle sql failed: {e}"))
            continue
        if scols != dcols:
            failed.append((name, f"columns differ: spark={scols} duck={dcols}"))
            continue
        if len(srows) != len(drows):
            failed.append((name, f"row count: spark={len(srows)} duck={len(drows)}"))
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            failed.append((name, f"row {bad[0]} differs:\n  spark={bad[1]}\n  duck ={bad[2]}"))
        else:
            passed.append((name, len(srows)))
    lines = [f"PASS {name} ({n} rows)" for name, n in passed]
    lines += [f"FAIL {name}: {why}" for name, why in failed]
    lines.append(f"\n{len(passed)} passed, {len(failed)} failed, "
                 f"{len(oracle) - len(passed) - len(failed)} skipped")
    report = "\n".join(lines)
    print(report)
    if record:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(record) or ".",
                                   prefix="." + os.path.basename(record))
        with os.fdopen(fd, "w") as f:
            f.write(report + "\n")
        os.replace(tmp, record)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
