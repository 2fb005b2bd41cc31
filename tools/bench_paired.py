#!/usr/bin/env python
"""Paired engine/oracle bench: time every oracle SQL in DuckDB in THIS
session and pair it with the engine's per-gate medians from
BENCH_local.json — the per-gate RATIO is the host-load-invariant signal
(absolute seconds on this box swing +/-35-45% with ambient load; the
ratio of two same-window measurements does not).

Usage: python tools/bench_paired.py [sfdir] [bench_json] [oracle_json]
  sfdir       parquet tables dir          (default /root/testdata/sf0.1)
  bench_json  engine medians              (default BENCH_local.json)
  oracle_json dumped by graft.Verify      (default /tmp/verify_out/oracle_sql.json
                                           or the path given)

Prints one JSON line: total engine sec, total oracle sec, overall ratio,
the per-gate ratios sorted worst-first, and any gates whose oracle SQL
failed. DuckDB gets the same treatment the engine gets: the median of 3
back-to-back reps, cold rep included on both sides.
"""
import sys, json, time, statistics
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
bench_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_local.json"
oracle_path = (sys.argv[3] if len(sys.argv) > 3
               else "/tmp/verify_out/oracle_sql.json")
REPS = 3

bench = json.load(open(bench_path))
engine = bench["queries"]
oracle = json.load(open(oracle_path))

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sfdir}/{t}.parquet')")

rows = []
for name, sql in sorted(oracle.items()):
    if name not in engine:
        continue
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
        except Exception as ex:
            times = None
            rows.append((name, engine[name], None, None,
                         f"{type(ex).__name__}"))
            break
        times.append(time.perf_counter() - t0)
    if times is None:
        continue
    osec = statistics.median(times)
    rows.append((name, engine[name], round(osec, 4),
                 round(engine[name] / osec, 2) if osec > 0 else None, None))

paired = [r for r in rows if r[3] is not None]
failed = {r[0]: r[4] for r in rows if r[4] is not None}
etot = sum(r[1] for r in paired)
otot = sum(r[2] for r in paired)
worst = sorted(paired, key=lambda r: -r[3])[:10]
print(json.dumps({
    "sf": sfdir,
    "n_paired": len(paired),
    "engine_total_sec": round(etot, 2),
    "oracle_total_sec": round(otot, 2),
    "ratio": round(etot / otot, 3) if otot else None,
    "worst_gates": {r[0]: {"engine": r[1], "oracle": r[2], "ratio": r[3]}
                    for r in worst},
    "oracle_failed": failed,
    "unpaired": sorted(set(oracle) - set(engine)),
    "note": "engine medians from " + bench_path +
            "; oracle timed in this session (median of %d)" % REPS,
}))
