#!/usr/bin/env python
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
against the same sf dir and diff with the Spark parquet dump (columns sorted
by name, exact value compare)."""
import sys, json, glob
import duckdb, pandas as pd, numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
        got = pd.concat([pd.read_parquet(p) for p in
                         sorted(glob.glob(f"{outdir}/{name}/*.parquet"))])
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            bad.append((name, f"cols {list(exp.columns)} vs {list(got.columns)}"))
            continue
        if len(exp) != len(got):
            bad.append((name, f"rows {len(exp)} vs {len(got)}"))
            continue
        diffs = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if e.dtype.kind == 'f' or g.dtype.kind == 'f':
                same = np.allclose(e.astype(float).fillna(np.nan),
                                   g.astype(float).fillna(np.nan),
                                   rtol=0, atol=0, equal_nan=True)
            else:
                same = e.astype(object).where(pd.notnull(e), None) \
                        .equals(g.astype(object).where(pd.notnull(g), None))
            if not same:
                mask = ~(e.astype(str) == g.astype(str))
                i = mask.idxmax() if mask.any() else 0
                diffs.append(f"{c}[row{i}]: {e.iloc[i]!r} vs {g.iloc[i]!r} "
                             f"(dtype {e.dtype}/{g.dtype})")
        if diffs:
            bad.append((name, "; ".join(diffs[:3])))
        else:
            ok.append(name)
    except Exception as ex:
        bad.append((name, f"EXC {type(ex).__name__}: {ex}"))

print(f"OK {len(ok)}/{len(oracle)}: {' '.join(ok)}")
for n, why in bad:
    print(f"FAIL {n}: {why}")
no_oracle = [d.split('/')[-1] for d in sorted(glob.glob(f"{outdir}/*"))
             if '.' not in d.split('/')[-1] and d.split('/')[-1] not in oracle]
print("rows-only (no oracle):", " ".join(no_oracle))
sys.exit(1 if bad else 0)
