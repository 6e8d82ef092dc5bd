#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/<name>/*.parquet (Spark results from graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB against views
over <sfDir>/*.parquet, sorts columns by name, sorts rows, and compares
values (exact for non-floats; tiny relative tolerance report for floats so
we can see whether a strict hash would pass).
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                                str(type(v)).endswith("ndarray'>") else v)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"FAIL {name}: columns differ spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"FAIL {name}: rows differ spark={len(a)} duck={len(b)}"
    worst = 0.0
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver hash-compares values strictly: an int column on one side vs a
        # float column on the other (e.g. DuckDB HUGEINT -> float64) is a FAIL
        # there even when values are numerically equal — mirror that here.
        a_int, b_int = pd.api.types.is_integer_dtype(av), pd.api.types.is_integer_dtype(bv)
        a_flt, b_flt = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        if (a_int and b_flt) or (a_flt and b_int):
            return (f"FAIL {name}: col {c} dtype-kind mismatch "
                    f"spark={av.dtype} duck={bv.dtype} (driver hash would fail)")
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64"); bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            diff = (av - bv).abs()
            scale = pd.concat([av.abs(), bv.abs()], axis=1).max(axis=1).clip(lower=1.0)
            rel = (diff / scale).where(~both_nan, 0.0)
            if rel.isna().any():
                return f"FAIL {name}: null mismatch in float col {c}"
            m = float(rel.max())
            worst = max(worst, m)
            if m > 0:
                # exact hash equality would fail; report magnitude
                if m > 1e-12:
                    i = int(rel.idxmax())
                    return (f"FAIL {name}: float col {c} differs rel={m:.2e} "
                            f"(spark={av[i]!r} duck={bv[i]!r})")
        else:
            eq = (av == bv) | (av.isna() & bv.isna())
            if not bool(eq.all()):
                i = int((~eq).idxmax())
                return (f"FAIL {name}: col {c} row {i} spark={av[i]!r} duck={bv[i]!r}")
    tag = "OK  " if worst == 0 else f"OK~ (float rel diff {worst:.1e})"
    return f"{tag} {name}: {len(a)} rows x {len(a.columns)} cols"

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
        msg = cmp(name, spark_df, duck_df)
        print(msg)
        if msg.startswith("FAIL"):
            fails += 1
    # queries with no oracle: rows-only check + dual-formulation compare
    # (Verify writes <name>__alt for the composable re-formulation; the two
    # must match exactly — this is their correctness gate)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle or name.endswith("__alt") or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        alt_files = glob.glob(f"{out_dir}/{name}__alt/*.parquet")
        if n == 0:
            print(f"FAIL {name}: rows-only, 0 rows"); fails += 1
        elif alt_files:
            a = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
            b = pd.concat([pd.read_parquet(f) for f in alt_files], ignore_index=True)
            msg = cmp(f"{name} (vs alt formulation)", a, b)
            print(msg)
            if msg.startswith("FAIL"): fails += 1
        else:
            print(f"OK   {name}: rows-only, {n} rows")
    print(f"== {fails} failures")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
