#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate (NOT part of the
library — driver-side python/duckdb only). Usage:
    python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet written by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir tables, and compares values column-name-sorted, row order kept.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def canon_type(t: "pa.DataType") -> str:
    """Canonical arrow-type name tuned to match the DRIVER's observed
    hash behavior (CORRECTNESS_r05): it forgives encoding/width variants
    within a numeric class (int32 vs int64, timestamp[ns] vs [us] vs
    date, string vs large_string) but FAILS on class changes — int64 vs
    DuckDB HUGEINT (arrow decimal128(38,0)) vs float64 hash differently.
    So: all ints → "int"; all floats → "float"; decimals keep (p,s);
    temporals → "datetime"; everything else keeps its logical name."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_dictionary(t):
        return canon_type(t.value_type)
    return str(t)


sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    got = duckdb.sql(f"SELECT * FROM '{d}/*.parquet'", connection=con).df()
    if name not in oracles:
        print(f"  {name:24s} rows={len(got):6d}  (no oracle)")
        continue
    # Arrow-level schemas: the driver hashes bytes, so a value-equal but
    # type-divergent column (int64 vs HUGEINT/float) must FAIL here too.
    got_schema = pq.ParquetDataset(d).schema
    exp_arrow = con.sql(oracles[name]).arrow()
    got_types = {f.name: canon_type(f.type) for f in got_schema}
    exp_types = {f.name: canon_type(f.type) for f in exp_arrow.schema}
    exp = exp_arrow.to_pandas()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    ok = list(got.columns) == list(exp.columns) and len(got) == len(exp)
    detail = ""
    if not ok:
        detail = (f" cols/rows mismatch got=({len(got)},{list(got.columns)})"
                  f" exp=({len(exp)},{list(exp.columns)})")
    if ok:
        for c in got.columns:
            if got_types.get(c) != exp_types.get(c):
                ok = False
                detail = (f" TYPE col={c} spark={got_types.get(c)}"
                          f" oracle={exp_types.get(c)}")
                break
    if ok:
        for c in got.columns:
            g, e = got[c], exp[c]
            try:
                if str(g.dtype).startswith("float") or str(e.dtype).startswith("float"):
                    import numpy as np
                    same = np.allclose(g.fillna(-1e308).astype(float),
                                       e.fillna(-1e308).astype(float),
                                       rtol=0, atol=0, equal_nan=True)
                    exact = (g.astype(float).fillna(-1e308) == e.astype(float).fillna(-1e308)).all()
                    same = bool(exact)
                else:
                    same = (g.astype(str).fillna("<n>") == e.astype(str).fillna("<n>")).all()
            except Exception as ex:
                same, detail = False, f" cmp-err:{ex}"
            if not same:
                ok = False
                bad = None
                try:
                    neq = (g.astype(str) != e.astype(str))
                    i = neq[neq].index[0]
                    bad = f" col={c} row={i} got={g[i]!r} exp={e[i]!r}"
                except Exception:
                    bad = f" col={c}"
                detail += bad
                break
    status = "OK " if ok else "FAIL"
    if not ok:
        fails += 1
    print(f"  {name:24s} rows={len(got):6d}  {status}{detail}")
missing = [k for k in oracles if not os.path.isdir(os.path.join(outdir, k))]
for k in missing:
    fails += 1
    print(f"  {k:24s} MISSING parquet output")
print(("ALL OK" if fails == 0 else f"{fails} FAILURES"))
sys.exit(1 if fails else 0)
