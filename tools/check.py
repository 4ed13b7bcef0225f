#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle at a given SF dir and diff exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run Verify first: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

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

def main(sf_dir, out_dir):
    def fresh_con():
        # one connection PER ORACLE: the big generated-CTE oracles (the
        # serving family at scaled corpora) otherwise accumulate DuckDB
        # allocator state across queries until a hard OOM abort kills
        # the whole gate; a bounded memory_limit turns would-be aborts
        # into per-query failures
        c = duckdb.connect()
        # raise the limit only when asked (GRAFT_CHECK_MEM, for the
        # scaled-corpus gates) — an unconditional 100GB default would
        # EXCEED physical RAM on smaller hosts and convert spillable
        # oracle queries into hard OOM aborts, the exact failure this
        # guard exists to prevent; otherwise keep DuckDB's ~80%-of-RAM
        # default. Thread count is also env-overridable: pipeline state
        # scales with threads, so fewer threads = less peak memory.
        if os.environ.get("GRAFT_CHECK_MEM"):
            c.sql(f"SET memory_limit='{os.environ['GRAFT_CHECK_MEM']}'")
        if os.environ.get("GRAFT_CHECK_THREADS"):
            c.sql(f"SET threads={int(os.environ['GRAFT_CHECK_THREADS'])}")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(p):  # Spark-written table dir (scaled corpora)
                c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
            elif os.path.exists(p):
                c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c
    con = fresh_con()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) if files \
            else pd.DataFrame()
        if name not in oracle:
            # the driver sorts rows-only outputs too — arrays/binary crash it
            try:
                norm(got)
            except Exception as e:
                print(f"[FAIL] {name}: rows-only output not sortable (driver would crash): {e}")
                continue
            print(f"[rows-only] {name}: rows={len(got)} {'OK' if len(got) > 0 else 'EMPTY!'}")
            n_ok += 1 if len(got) > 0 else 0
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            try:
                con.close()
            except Exception:
                pass
            con = fresh_con()
            continue
        finally:
            if os.environ.get("GRAFT_CHECK_FRESH_CON"):
                con.close()
                con = fresh_con()
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(e.columns)}")
            continue
        if list(g.dtypes) != list(e.dtypes):
            print(f"[FAIL] {name}: dtypes spark={dict(g.dtypes.astype(str))} "
                  f"!= oracle={dict(e.dtypes.astype(str))}")
            continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} != {len(e)}")
            continue
        diff = (g != e) & ~(g.isna() & e.isna())
        if diff.any().any():
            bad = diff.any(axis=1)
            print(f"[FAIL] {name}: {int(bad.sum())} mismatched rows; first:")
            idx = bad.idxmax()
            print("  spark:", g.loc[idx].to_dict())
            print("  duck :", e.loc[idx].to_dict())
            continue
        print(f"[ok] {name}: {len(g)} rows")
        n_ok += 1
    print(f"== {n_ok}/{len(names)} green ==")
    return 0 if n_ok == len(names) else 1

def lint_survey_ids():
    """SURVEY.md §2 row ids are the human index — duplicates break
    cross-referencing from VERDICT/ADVICE. Fail loudly on collision."""
    import collections, re
    path = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    text = open(path).read()
    # anchor to the §2 table: other sections may hold tables whose first
    # column also matches the numeric-id pattern
    start = text.index("## §2")
    end = text.index("## §3", start)
    ids = re.findall(r"^\| ([0-9]+[a-z0-9]*) \|", text[start:end], re.M)
    dups = [k for k, n in collections.Counter(ids).items() if n > 1]
    if dups:
        print(f"[FAIL] SURVEY.md duplicate row ids: {sorted(dups)}")
        return 1
    print(f"[ok] SURVEY.md row ids unique ({len(ids)} rows)")
    return 0

if __name__ == "__main__":
    rc = lint_survey_ids()
    sys.exit(rc or main(sys.argv[1], sys.argv[2]))
