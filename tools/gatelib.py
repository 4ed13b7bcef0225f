"""Shared gate plumbing for tools/check.py and tools/gate_one_con.py:
table registration, result loading, normalization, and the exact
column/dtype/row/cell comparison ladder. One copy so the two gate
regimes (per-connection vs one-connection stress) can never drift on
WHAT a pass means — only on HOW connections/limits are managed.
"""
import os, glob
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def register_views(con, sf_dir):
    """CREATE VIEW per testdata table; handles both single-file parquet
    and Spark-written table directories (scaled corpora)."""
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def load_result(out_dir, name):
    """Concatenate Verify's parquet dump for one query (empty frame if
    the dump is missing — the comparer reports it as a row mismatch)."""
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return pd.DataFrame()
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # unify int widths only (int32→int64); deliberately do NOT coerce
    # float↔int — the driver's hash is dtype-sensitive (a DuckDB HUGEINT
    # arriving as float64 vs Spark's int64 is a real mismatch; oracle SQL
    # must CAST(... AS BIGINT))
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def rows_only_status(got: pd.DataFrame):
    """The driver sorts rows-only outputs too — arrays/binary crash it.
    Returns (ok, message)."""
    try:
        norm(got)
    except Exception as e:  # unsortable output would crash the driver
        return False, f"rows-only output not sortable (driver would crash): {e}"
    ok = len(got) > 0
    return ok, f"rows={len(got)} {'OK' if ok else 'EMPTY!'}"


def compare(got: pd.DataFrame, exp: pd.DataFrame):
    """The exact pass ladder: columns, dtypes, row count, then cell
    equality with NaN==NaN. Returns (status_or_None, g, e) where status
    is a FAIL description and g/e are the normalized frames (for the
    caller's first-mismatch diagnostics)."""
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        return f"columns {list(g.columns)} != {list(e.columns)}", g, e
    if list(g.dtypes) != list(e.dtypes):
        return (f"dtypes spark={dict(g.dtypes.astype(str))} "
                f"!= oracle={dict(e.dtypes.astype(str))}"), g, e
    if len(g) != len(e):
        return f"rows {len(g)} != {len(e)}", g, e
    diff = (g != e) & ~(g.isna() & e.isna())
    if diff.any().any():
        return f"{int(diff.any(axis=1).sum())} mismatched rows", g, e
    return None, g, e
