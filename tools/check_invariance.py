#!/usr/bin/env python
"""Partitioning-invariance diff: compare two Verify dumps of the same sf dir
produced under different session configs (shuffle width, input split size,
AQE). Same discipline as check_oracle.py — columns sorted by name, rows
compared IN ORDER, floats exact (atol=0) — so a pass means the gate's
result, including row order and every float bit pattern, is independent of
physical partitioning. A gate that only passes the oracle because the
default config reproduces one specific fold order fails here.

Usage: check_invariance.py OUT_A OUT_B
"""
import sys, glob, os
import pandas as pd, numpy as np

a_dir, b_dir = sys.argv[1], sys.argv[2]

def load(outdir, name):
    paths = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not paths:
        return None
    df = pd.concat([pd.read_parquet(p) for p in paths])
    return df[sorted(df.columns)].reset_index(drop=True)

def canon(v):
    """Stable scalar repr for nested values (arrays/maps land as objects)."""
    if isinstance(v, np.ndarray):
        return tuple(canon(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if isinstance(v, float) and np.isnan(v):
        return "NaN"
    return v

# gate set = the UNION of both dumps, and it must be non-empty: a run
# that crashed before (or while) dumping must fail the sweep loudly, not
# shrink the compared set or pass 0/0 vacuously (the same no-vacuous-pass
# rule as the fault injector)
names = sorted({d.split('/')[-1]
                for out in (a_dir, b_dir)
                for d in glob.glob(f"{out}/*") if os.path.isdir(d)})
if not names:
    print("DIVERGED <sweep>: no gate dumps found in either dir")
    sys.exit(1)
# ... and the union can't see a gate that crashed in BOTH runs. Each dump
# carries oracle_sql.json (every oracle-able gate by name, written by
# Verify before the per-gate loop), so require every manifest gate to
# have a dump — a same-gate double crash fails here instead of silently
# leaving the sweep's compared set one short.
import json
manifest = set()
for out in (a_dir, b_dir):
    p = os.path.join(out, "oracle_sql.json")
    if os.path.exists(p):
        with open(p) as f:
            manifest |= set(json.load(f).keys())
missing = sorted(manifest - set(names))
if missing:
    print(f"DIVERGED <sweep>: manifest gates with no dump in either dir: "
          f"{', '.join(missing)}")
    sys.exit(1)
ok, bad = [], []
for name in names:
    ea, eb = load(a_dir, name), load(b_dir, name)
    if ea is None or eb is None:
        bad.append((name, "missing dump on one side"))
        continue
    if list(ea.columns) != list(eb.columns):
        bad.append((name, f"cols {list(ea.columns)} vs {list(eb.columns)}"))
        continue
    if len(ea) != len(eb):
        bad.append((name, f"rows {len(ea)} vs {len(eb)}"))
        continue
    diffs = []
    for c in ea.columns:
        x, y = ea[c], eb[c]
        if x.dtype.kind == 'f' and y.dtype.kind == 'f':
            same = np.allclose(x, y, rtol=0, atol=0, equal_nan=True)
        else:
            same = x.map(canon).equals(y.map(canon))
        if not same:
            if x.dtype.kind == 'f' and y.dtype.kind == 'f':
                mask = ~((x == y) | (x.isna() & y.isna()))
            else:
                mask = x.map(canon) != y.map(canon)
            i = int(mask.idxmax()) if mask.any() else 0
            diffs.append(f"{c}[row{i}]: {x.iloc[i]!r} vs {y.iloc[i]!r}")
    if diffs:
        bad.append((name, "; ".join(diffs[:3])))
    else:
        ok.append(name)

print(f"INVARIANT {len(ok)}/{len(names)}")
for n, why in bad:
    print(f"DIVERGED {n}: {why}")
sys.exit(1 if bad else 0)
