#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle at a given SF dir and diff exactly.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run Verify first: sbt "runMain graft.Verify <sfDir> <outDir>")

Normalization + the compare ladder live in tools/gatelib.py, shared with
tools/gate_one_con.py so the two gate regimes can't drift.
"""
import sys, os, json
import duckdb

sys.path.insert(0, os.path.dirname(__file__))
from gatelib import register_views, load_result, rows_only_status, compare

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
        register_views(c, sf_dir)
        return c
    con = fresh_con()
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        got = load_result(out_dir, name)
        if name not in oracle:
            ok, msg = rows_only_status(got)
            if ok:
                print(f"[rows-only] {name}: {msg}")
                n_ok += 1
            else:
                print(f"[FAIL] {name}: {msg}")
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
        status, g, e = compare(got, exp)
        if status is None:
            print(f"[ok] {name}: {len(g)} rows")
            n_ok += 1
        elif status.endswith("mismatched rows"):
            print(f"[FAIL] {name}: {status}; first:")
            diff = (g != e) & ~(g.isna() & e.isna())
            idx = diff.any(axis=1).idxmax()
            print("  spark:", g.loc[idx].to_dict())
            print("  duck :", e.loc[idx].to_dict())
        else:
            print(f"[FAIL] {name}: {status}")
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
