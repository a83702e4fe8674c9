#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (via sbt) at a given SF, then replays each oracle SQL in
DuckDB against the same fixture parquet and compares: row count, sorted-by-name
columns, and values (doubles rounded). Usage:

    python3 tools/check.py [sfdir] [outdir] [--skip-verify] [--exact]

--exact demands BITWISE equality on float columns (no tolerance): the engine's
aggregates are built on exact decimal arithmetic, so any bit diff vs the oracle
is a real nondeterminism bug, the kind the driver's hash compare fails on.
"""
import json, math, os, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], r.stderr[-2000:])
        sys.exit(1)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            if "--exact" not in sys.argv:
                df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            # decimals / hugeints from duckdb
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def make_views(con):
    # a table is a single parquet file (driver fixtures) or a Spark-written
    # DIRECTORY of part files (the local sf1 data)
    for t in TABLES:
        p = Path(f"{SF}/{t}.parquet")
        src = f"'{p}/*.parquet'" if p.is_dir() else f"'{p}'"
        if not p.exists():
            continue
        sel = "SELECT *"
        if t == "events":
            # the sf1 replica stores ts as the raw nanos BIGINT (the same
            # value Spark reads via nanosAsLong); the oracles want TIMESTAMP
            ts_type = con.sql(f"SELECT typeof(ts) FROM {src} LIMIT 1").fetchone()[0]
            if ts_type == "BIGINT":
                sel = "SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.sql(f"CREATE VIEW {t} AS {sel} FROM {src}")


def connect():
    # A bounded allocator: right after the Spark JVM exits the page cache is
    # still hot and DuckDB's default 80%-of-RAM budget can fail allocation
    # ("Failed to allocate block ...") on the heavy recursive-CTE oracles.
    # A modest explicit limit sidesteps the pressure window entirely.
    con = duckdb.connect()
    # cap at half of physical RAM so a small host never gets a budget ABOVE
    # duckdb's own 80%-of-RAM default (which would reintroduce the failures)
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError):
        total = 48 << 30
    limit_gb = max(1, min(24, total // 2 // (1 << 30)))
    con.sql(f"SET memory_limit='{limit_gb}GB'")
    con.sql("SET threads TO 8")
    # let the heavy recursive-CTE oracles SPILL instead of failing when the
    # budget is tight — an oracle-side OOM is a harness failure, not an
    # engine finding, so trade disk for robustness
    # (preserve_insertion_order=false was tried here and REGRESSED: it
    # re-parallelizes the recursive-CTE oracles into a thread-local-state
    # blowup that aborts the process on the LSH replays. Keep the default.)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    return con


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    # --only=a,b,c restricts the compare (e.g. spot-checking cheap oracles
    # at sf1, where the heavy recursive-CTE oracles are impractical)
    only = None
    for a in sys.argv:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    # queries without an oracle: rows-only check (driver does the same)
    for d in sorted(OUT.iterdir()):
        if d.is_dir() and d.name not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS {d.name}: {n}")
            except Exception as e:
                print(f"ROWS {d.name}: unreadable ({e})")
    n_pass = n_fail = 0
    # ONE connection for the whole sweep. Two failure shapes were chased
    # here and BOTH were connection-churn, not query cost: every extra
    # duckdb.connect() spins up its own thread pool and allocator arenas,
    # and a sweep that reconnects per query (or retries too eagerly) dies
    # around oracle ~110 with "cannot allocate memory for thread-local
    # data" / hard segfaults, while each individual oracle peaks under
    # 200 MB. Reuse the connection; recycle it ONLY on a failed oracle
    # (closing the old one first) so one poisoned query can't cascade
    # catalog errors to the rest.
    import gc
    con = connect()
    make_views(con)
    n_run = 0
    for name in sorted(oracle):
        # Recycle the connection every 40 oracles: one connection for the
        # whole sweep accumulates allocator arenas and segfaults around
        # oracle ~137 (observed on the x73 recursive-CTE oracle at sf0.1),
        # while per-query reconnects die from thread-pool churn (above).
        # A coarse cadence avoids both failure shapes.
        n_run += 1
        if n_run % 40 == 0:
            try:
                con.close()
            except Exception:
                pass
            gc.collect()
            con = connect()
            make_views(con)
        try:
            got = canon(pd.read_parquet(OUT / name))
            # Transient OOM (page-cache pressure right after the Spark JVM
            # exits): one paused retry on a recycled connection.
            want = None
            for attempt in range(2):
                try:
                    want = canon(con.sql(oracle[name]).df())
                    break
                except Exception as e:
                    if "Out of Memory" not in str(e) or attempt == 1:
                        raise
                    import time
                    time.sleep(15)
                    try:
                        con.close()
                    except Exception:
                        pass
                    gc.collect()
                    con = connect()
                    make_views(con)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            try:
                con.close()
            except Exception:
                pass
            gc.collect()
            try:
                fresh = connect()
                make_views(fresh)
                con = fresh
            except Exception:
                pass
            continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            ok = False
        else:
            for c in got.columns:
                g, w = got[c], want[c]
                # The driver hashes typed values: Spark int64 vs a DuckDB
                # HUGEINT (sum of ints) that pandas renders as float64 is a
                # hash mismatch even when numerically equal. Surface it.
                if (
                    "--exact" in sys.argv
                    and g.dtype.kind != w.dtype.kind
                    and {g.dtype.kind, w.dtype.kind} <= {"i", "u", "f"}
                    and "f" in {g.dtype.kind, w.dtype.kind}
                ):
                    print(
                        f"FAIL {name}.{c}: dtype {g.dtype} vs {w.dtype} "
                        "(int/float mix — driver hash would differ; "
                        "CAST the oracle column)"
                    )
                    ok = False
                    break
                if g.dtype.kind == "f" or w.dtype.kind == "f":
                    if "--exact" in sys.argv:
                        bad = ~((g.isna() & w.isna()) | (g == w))
                    else:
                        bad = ~(
                            (g.isna() & w.isna())
                            | (abs(g - w) <= 1e-6 + 1e-9 * abs(w))
                        )
                else:
                    bad = ~((g.isna() & w.isna()) | (g == w))
                if bad.any():
                    i = bad.idxmax()
                    print(f"FAIL {name}.{c}: row {i}: got={g[i]!r} want={w[i]!r} ({int(bad.sum())} diffs)")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
