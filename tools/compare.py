#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify output vs
DuckDB oracle on the same tables. Usage: compare.py <sfDir> <outDir>"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

def canon_cell(v):
    """arrays arrive as np.ndarray (pyarrow) vs list (duckdb): compare as
    tuples; scalars pass through."""
    if isinstance(v, np.ndarray):
        return tuple(canon_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(canon_cell(x) for x in v)
    return v

def has_array_cells(series):
    """The DRIVER's compare sorts rows by every column with pandas, which
    cannot hash ndarray cells — an array-typed output column passes here
    (canon_cell) but fails the driver. Flag it so the local gate predicts
    the driver gate."""
    for v in series.head(50):
        if isinstance(v, (np.ndarray, list, tuple)):
            return True
    return False

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written directory-style parquet
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes, weak = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    # Read the Spark output via pyarrow/pandas (like the driver), NOT via
    # DuckDB: DuckDB fetchdf normalizes DECIMAL to float64 on both sides,
    # hiding decimal/object dtype divergence the driver's gate can see.
    parts = sorted(glob.glob(f"{d}/*.parquet"))
    if not parts:
        # an empty result written with zero tasks leaves only _SUCCESS;
        # synthesize an empty frame instead of letting pd.concat throw
        got = pd.DataFrame()
    else:
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
    if name not in oracle:
        weak.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle sql error: {e}"))
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"rowcount {len(got)} vs {len(exp)}"))
        continue
    ok = True
    for c in got.columns:
        gv, ev = got[c], exp[c]
        if str(gv.dtype) != str(ev.dtype):
            fails.append((name, f"dtype[{c}]: {gv.dtype} vs {ev.dtype}"))
            ok = False
            break
        if str(gv.dtype) == "object":
            if has_array_cells(gv) or has_array_cells(ev):
                fails.append((name, f"array-typed cells in [{c}]: driver's "
                              "row-sort cannot hash them — emit scalars "
                              "(array_join / explode) instead"))
                ok = False
                break
            gv = gv.map(canon_cell)
            ev = ev.map(canon_cell)
        eq = (gv == ev) | (gv.isna() & ev.isna())
        if not eq.all():
            bad = (~eq).idxmax()
            fails.append((name, f"value[{c}] row {bad}: {gv[bad]!r} vs {ev[bad]!r}"))
            ok = False
            break
    if ok:
        passes.append(name)

print(f"PASS ({len(passes)}): {' '.join(passes)}")
print(f"WEAK rows-only ({len(weak)}): {' '.join(n for n,_ in weak)}")
if fails:
    print(f"FAIL ({len(fails)}):")
    for n, msg in fails:
        print(f"  {n}: {msg}")
    sys.exit(1)
