#!/usr/bin/env python3
"""DuckDB side of the bench contract pair (the judge's method).

Runs every oracle SQL from a Verify dump's oracle_sql.json against the
given scale-factor directory with 32 threads and a per-query interrupt,
and writes one JSON artifact with per-query seconds, total over the
queries that finished, and /proc/loadavg context.

Usage:
  python3 tools/duckbench.py <sfDir> <oracle_sql.json> <out.json> [interrupt_s]

Run back-to-back with the Spark suite (same sitting, quiet host) — both
engines' totals swing with ambient load and buffer-cache warmth, so only
same-sitting pairs are comparable (see BASELINE.md discount rule).
"""
import sys, json, time, threading
import duckdb

def loadavg():
    try:
        return open("/proc/loadavg").read().split()[:3]
    except OSError:
        return []

def main(sf_dir, oracle_path, out_path, interrupt_s=60.0, warm=False):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    load0 = loadavg()
    queries, failed = {}, {}
    for name in sorted(oracle):
        sql = oracle[name]
        if warm:
            # optional symmetric warm pass (--warm): one untimed run per
            # query, interrupt-capped, mirroring the Spark side's warm-up.
            # Off by default — historical pairs were recorded without it
            # (DuckDB has no JIT; its warm state is the buffer cache).
            timer = threading.Timer(interrupt_s, con.interrupt)
            timer.start()
            try:
                con.sql(sql).fetchall()
            except Exception:
                pass
            finally:
                timer.cancel()
        # up to one retry: the interrupt Timer can race query completion
        # (fire after fetchall returns but before cancel) and poison the
        # NEXT statement on the shared connection — a genuinely-fast query
        # must not be recorded as failed in the contract artifact
        for attempt in (0, 1):
            timer = threading.Timer(interrupt_s, con.interrupt)
            timer.start()
            t0 = time.time()
            try:
                con.sql(sql).fetchall()
                queries[name] = round(time.time() - t0, 3)
                break
            except Exception:
                elapsed = time.time() - t0
                if elapsed >= 0.9 * interrupt_s or attempt == 1:
                    failed[name] = -round(elapsed, 3)
                    break
            finally:
                timer.cancel()
    out = {
        "total_ok": round(sum(queries.values()), 3),
        "n_ok": len(queries),
        "failed": failed,
        "loadavg_start": load0,
        "loadavg_end": loadavg(),
        "sf": sf_dir,
        "queries": queries,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(json.dumps({k: out[k] for k in
                      ("total_ok", "n_ok", "failed", "loadavg_start", "loadavg_end")}))

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--warm"]
    main(args[0], args[1], args[2],
         float(args[3]) if len(args) > 3 else 60.0,
         warm="--warm" in sys.argv)
