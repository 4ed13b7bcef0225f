#!/usr/bin/env python3
"""Driver-regime stress gate: ONE DuckDB connection, default settings,
every oracle sequentially in sorted-name order — the harshest plausible
model of the driver's harness (r15's CORRECTNESS artifact came back
empty; the builder's per-connection replica hid whatever killed it).

Records per-oracle wall time and process RSS growth so the memory hogs
are named. Normalization + the compare ladder live in tools/gatelib.py,
shared with tools/check.py so the two gate regimes can't drift.

Usage: python3 tools/gate_one_con.py <sfDir> <verifyOutDir> [report.jsonl]
"""
import sys, os, json, time, hashlib
import duckdb

sys.path.insert(0, os.path.dirname(__file__))
from gatelib import register_views, load_result, rows_only_status, compare


def frame_hash(df):
    """Stable content hash of a normalized frame — lets the report
    self-certify WHAT matched, not just that something ran."""
    try:
        return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()[:16]
    except Exception:
        return None


def rss_gb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 2**20
    return -1.0


def main(sf_dir, out_dir, report=None):
    con = duckdb.connect()  # defaults: no memory_limit/threads overrides
    register_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    rep = open(report, "w") if report else None
    n_ok, rows_only = 0, 0
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        got = load_result(out_dir, name)
        if name not in oracle:
            ok, msg = rows_only_status(got)
            n_ok += 1 if ok else 0
            rows_only += 1
            # rows-only rows go to the report too: the artifact alone
            # certifies the FULL keyed surface, not just the oracle set
            if rep:
                rep.write(json.dumps({"name": name, "mode": "rows_only", "ok": ok,
                                      "rows": int(len(got))}) + "\n")
                rep.flush()
            print(f"{'[rows-only]' if ok else '[FAIL]'} {name}: {msg}", flush=True)
            continue
        r0, t0 = rss_gb(), time.time()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error after {time.time()-t0:.1f}s "
                  f"rss {r0:.2f}->{rss_gb():.2f}GB: {str(e)[:300]}", flush=True)
            if rep:
                rep.write(json.dumps({"name": name, "mode": "oracle", "ok": False,
                                      "sec": round(time.time()-t0, 2),
                                      "rss0": round(r0, 2), "rss1": round(rss_gb(), 2),
                                      "err": str(e)[:200]}) + "\n")
                rep.flush()
            continue
        dt, r1 = time.time() - t0, rss_gb()
        status, g, e = compare(got, exp)
        if rep:
            rec = {"name": name, "mode": "oracle", "ok": status is None,
                   "sec": round(dt, 2), "rss0": round(r0, 2), "rss1": round(r1, 2),
                   "rows": int(len(g)), "oracle_rows": int(len(e)),
                   "hash": frame_hash(g)}
            if status:
                rec["status"] = status[:200]
            rep.write(json.dumps(rec) + "\n")
            rep.flush()
        if status:
            print(f"[FAIL] {name}: {status}  ({dt:.1f}s, rss {r0:.2f}->{r1:.2f}GB)", flush=True)
        else:
            print(f"[ok] {name}: {len(g)} rows  ({dt:.1f}s, rss {r0:.2f}->{r1:.2f}GB)", flush=True)
            n_ok += 1
    print(f"== {n_ok}/{len(names)} green ({rows_only} rows-only) | final rss {rss_gb():.2f}GB ==")
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
