#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
SQL in DuckDB against the sfDir parquet tables, loads the corresponding
Spark result parquet, sorts columns by name, and compares values exactly
(with a float report showing max abs diff when not bit-identical).
Dev-only tool — not part of the library.
"""
import duckdb, glob, json, os, sys
import pandas as pd
import numpy as np

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # dev convenience: restrict to a comma-separated name list (matches
    # Verify's optional third arg, so partial dumps don't spam FAILs)
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        res_dir = f"{outdir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result at {res_dir}")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        got = got[sorted(got.columns)].reset_index(drop=True)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if pd.api.types.is_datetime64_any_dtype(e) or pd.api.types.is_datetime64_any_dtype(g):
                e = pd.to_datetime(e, utc=True).astype("datetime64[us, UTC]")
                g = pd.to_datetime(g, utc=True).astype("datetime64[us, UTC]")
            # The driver hashes raw VALUES, so kind drift — int on one
            # side vs float on the other (e.g. DuckDB HUGEINT -> pandas
            # float64) — hash-mismatches even when values compare
            # equal. Width within a kind does NOT matter: Spark's
            # row_number()/size() emit int32 against DuckDB BIGINT and
            # those rows have been green in the driver's gate since
            # round 1, so comparing itemsize would false-fail locally.
            # Normalize pandas extension dtypes (pyarrow-backed Int64
            # etc.) through their numpy_dtype so a nullable-int vs
            # float pairing is still flagged.
            def _kind(s):
                d = s.dtype
                d = getattr(d, "numpy_dtype", d)  # pandas extension dtypes
                try:
                    k = np.dtype(d).kind
                except TypeError:
                    return None
                return "i" if k == "u" else k
            ek, gk = _kind(e), _kind(g)
            if ek is None or gk is None or ek != gk:
                bad_cols.append(f"{c} (dtype mismatch: exp={e.dtype} got={g.dtype} — driver hash would differ)")
                continue
            # Same-kind WIDTH drift (int32 vs int64, float32 vs float64)
            # is value-equal under the driver's hash, but it is still
            # schema drift worth seeing — surface it as a warning
            # without failing the row.
            def _size(s):
                d = getattr(s.dtype, "numpy_dtype", s.dtype)
                try:
                    return np.dtype(d).itemsize
                except TypeError:
                    return None
            es, gs = _size(e), _size(g)
            if es is not None and gs is not None and es != gs:
                print(f"warn {name}.{c}: width drift exp={e.dtype} got={g.dtype} (values still compared)")
            if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(g):
                ef, gf = e.astype(float), g.astype(float)
                same = (ef.values == gf.values) | (ef.isna().values & gf.isna().values)
                if not same.all():
                    d = np.nanmax(np.abs(ef.values - gf.values))
                    bad_cols.append(f"{c} (float, {int((~same).sum())} diffs, maxabs={d:.3e})")
            else:
                same = (e.values == g.values) | (pd.isna(e).values & pd.isna(g).values)
                if not same.all():
                    i = int(np.argmax(~same))
                    bad_cols.append(f"{c} ({int((~same).sum())} diffs, first@{i}: exp={e.iloc[i]!r} got={g.iloc[i]!r})")
        if bad_cols:
            print(f"FAIL {name}: " + "; ".join(bad_cols))
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} failed ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
