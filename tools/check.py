#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against the DuckDB oracle in oracle_sql.json.

Compare discipline (strictest plausible driver behavior): sort columns by
name, sort rows by all columns, compare cell values exactly (floats bitwise).
"""
import sys, json, math, glob
import duckdb

def normalize(rows, cols):
    # rows: list of tuples in `cols` order -> sorted rows of stringified cells
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        cells = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                cells.append(v.hex() if not math.isnan(v) else "nan")
            elif isinstance(v, bytes):
                cells.append(v.hex())
            else:
                cells.append(repr(v))
        out.append(tuple(cells))
    out.sort()
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{qdir}*.parquet')")
        except Exception as e:
            results[name] = f"NO_OUTPUT {str(e)[:80]}"
            continue
        gcols, grows = normalize(got.fetchall(), [d[0] for d in got.description])
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(grows)}"
            continue
        try:
            want = con.sql(oracle[name])
            wcols, wrows = normalize(want.fetchall(), [d[0] for d in want.description])
        except Exception as e:
            results[name] = f"ORACLE_ERROR {str(e)[:120]}"
            continue
        if gcols != wcols:
            results[name] = f"SCHEMA_MISMATCH spark={gcols} duck={wcols}"
        elif len(grows) != len(wrows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(grows)} duck={len(wrows)}"
        elif grows != wrows:
            bad = sum(1 for a, b in zip(grows, wrows) if a != b)
            diff = next((a, b) for a, b in zip(grows, wrows) if a != b)
            results[name] = f"VALUE_MISMATCH {bad}/{len(grows)} rows; first: spark={diff[0]} duck={diff[1]}"
        else:
            results[name] = f"OK rows={len(grows)}"
    width = max(len(k) for k in results)
    nok = 0
    for k in sorted(results):
        print(f"{k:<{width}}  {results[k]}")
        nok += results[k].startswith("OK") or results[k].startswith("ROWS_ONLY")
    print(f"\n{nok}/{len(results)} pass")
    return 0 if nok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
