#!/usr/bin/env python3
"""Dev-only harness: compare Verify output parquet against DuckDB oracle SQL.

Mimics the driver's t2 gate: for each query, run the oracle SQL in DuckDB
over views of the sf parquet tables, sort columns by name, sort rows, and
compare values. Usage: check_oracle.py <sfdir> <verify_out_dir> [results.json]
Tables may be single files (driver layout) or directories of part files
(ScaleData replica layout). Optional third arg: write a per-query
CORRECTNESS-style JSON alongside the printed report.

--hash (round-11 verdict #7): compare md5 over a CANONICAL STRING
serialization of every cell instead of value-wise allclose — the
driver's gate is hash-based, so a value that is numerically equal but
FORMATS differently (e.g. -0.0 vs 0.0, float repr drift) passes the
value compare yet fails the driver; hash mode makes that class of
divergence observable locally. Floats canonicalize via np.float64 repr
(shortest round-trip), so two bit-identical doubles always hash equal
and two different bit patterns never do.
"""
import json, sys, glob, os, hashlib, gc
import duckdb
import pandas as pd
import numpy as np

def release_heap():
    """Return freed heap to the OS between queries. Per-query duckdb
    connections are NOT enough at replica scale: glibc retains freed
    pandas/duckdb pages in its arenas, so a long walk's RSS ratchets up
    until some query's allocation fails — and once that happens every
    later query dies on byte-sized allocations ("Failed to allocate
    block of 8 bytes"), reading as a cascade of engine failures when
    the engine output was never at fault (round-20 sf5: q164→q166
    in-run, all green in fresh processes). malloc_trim gives the freed
    arenas back; no-op where unavailable."""
    gc.collect()
    try:
        import ctypes
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass

def canon_cell(v):
    """Canonical string of one cell: bit-faithful for floats."""
    if v is None:
        return "<null>"
    if isinstance(v, (float, np.floating)):
        if np.isnan(v):
            return "NaN"
        return repr(float(v))  # shortest round-trip repr; keeps -0.0
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if v is pd.NaT or (isinstance(v, pd._libs.missing.NAType) if hasattr(pd._libs, "missing") else False):
        return "<null>"
    return str(v)

def df_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(canon_cell(v) for v in row) + "\n").encode())
    return h.hexdigest()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def fresh_con(sfdir):
    # one connection PER QUERY: DuckDB state accumulated across a long
    # battery cost q99 its headroom at the sf5 replicas (passed fresh,
    # OOM'd after 150 prior queries). Views are trivial to recreate.
    # bounded memory + disk spill: a heavy oracle (BPE-apply CTE
    # chains) once exhausted process memory and took the whole compare
    # down; a limit makes DuckDB spill spillable operators instead,
    # and the per-query except below turns a genuinely untractable
    # oracle into ONE failed row
    # limit derives from the HOST (round-15 advice: the old hardcoded
    # 84GB let DuckDB allocate past physical memory on smaller boxes
    # before ever spilling): ~70% of total RAM, overridable via
    # DUCK_MEM_LIMIT; spill dir likewise via DUCK_SPILL_DIR.
    mem = os.environ.get("DUCK_MEM_LIMIT")
    if not mem:
        # 50%, not 70% (round-17 lesson): DuckDB's pool shares the
        # process with pandas peaks (a 5M-row window frame costs tens
        # of GB while both engines' results are resident for compare) —
        # at 70% the sf5 battery OOM'd DuckDB AND numpy mid-run, while
        # the same oracles pass standalone. Spill beats bad_alloc.
        total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / (1 << 30)
        mem = f"{max(1, int(total_gb * 0.5))}GB"
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET temp_directory='{os.environ.get('DUCK_SPILL_DIR', '/tmp/duck_spill')}'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con

def main(sfdir, outdir, json_out=None, hash_mode=False,
         only=None, start_from=None):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    results = {}
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if not os.path.isdir(d):
            continue
        if only and not any(name.startswith(p) for p in only):
            continue
        if start_from and name < start_from:
            continue
        files = glob.glob(f"{d}/*.parquet")
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(spark_df)} rows")
            results[name] = {"rows_only": True, "spark_rows": len(spark_df)}
            continue
        try:
            con = fresh_con(sfdir)
            try:
                duck_df = con.execute(oracle[name]).df()
            finally:
                con.close()
            a, b = norm(spark_df), norm(duck_df)
            if list(a.columns) != list(b.columns):
                raise AssertionError(f"columns differ: {list(a.columns)} vs {list(b.columns)}")
            if len(a) != len(b):
                raise AssertionError(f"row count {len(a)} vs {len(b)}")
            if hash_mode:
                ha, hb = df_hash(a), df_hash(b)
                if ha != hb:
                    # locate the first differing cell for the report
                    detail = ""
                    for c in a.columns:
                        sa = a[c].map(canon_cell); sb = b[c].map(canon_cell)
                        bad = sa != sb
                        if bad.any():
                            i = bad.idxmax()
                            detail = f"; first diff col {c} row {i}: spark={sa[i]!r} duck={sb[i]!r}"
                            break
                    raise AssertionError(f"hash {ha} vs {hb}{detail}")
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    ok = np.allclose(av.astype(float), bv.astype(float),
                                     rtol=0, atol=0, equal_nan=True)
                else:
                    ok = (av.astype(str) == bv.astype(str)).all()
                if not ok:
                    diffs = (av != bv)
                    raise AssertionError(
                        f"col {c} mismatch; dtype {av.dtype}/{bv.dtype}; "
                        f"first diffs:\n{pd.DataFrame({'spark': av[diffs], 'duck': bv[diffs]}).head(5)}")
            print(f"  [PASS] {name} ({len(a)} rows)")
            results[name] = {"rows_match": True, "schema_match": True,
                             "hash_match": True, "spark_rows": len(a),
                             "oracle_rows": len(b), "err": None}
            n_pass += 1
        except Exception as e:  # oracle SQL errors count as failures, not crashes
            print(f"  [FAIL] {name}: {e}")
            results[name] = {"rows_match": False, "err": str(e)[:500]}
            n_fail += 1
        finally:
            # drop this query's frames before trimming, or they pin the heap
            spark_df = duck_df = a = b = None
            release_heap()
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional: --only q62,q117 (name-prefix filter), --from q130
    # (resume the sorted walk there) — local-iteration / long-battery
    # resume aids; the driver's positional usage is unchanged
    USAGE = ("usage: check_oracle.py <sfdir> <verify_out> [results.json] "
             "[--hash] [--only=qX,qY] [--from=qX]\n"
             "note: --only/--from REQUIRE the '=' syntax - a space-separated "
             "value would silently become a positional arg (round-17 verdict #2)")
    only = start_from = None
    argv = []
    for a in sys.argv[1:]:
        if a == "--hash":
            continue
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        elif a.startswith("--from="):
            start_from = a.split("=", 1)[1]
        elif a.startswith("-"):
            # unknown flag (incl. bare --only / --from): loud error, never
            # a silently ignored arg or a file named after the flag
            sys.exit(f"check_oracle.py: unknown flag '{a}'\n{USAGE}")
        else:
            argv.append(a)
    if not (2 <= len(argv) <= 3):
        sys.exit(f"check_oracle.py: expected 2-3 positional args, "
                 f"got {len(argv)}: {argv}\n{USAGE}")
    for p in argv[:2]:
        if not os.path.isdir(p):
            sys.exit(f"check_oracle.py: '{p}' is not a directory\n{USAGE}")
    hash_mode = "--hash" in sys.argv[1:]
    sys.exit(main(argv[0], argv[1],
                  argv[2] if len(argv) > 2 else None, hash_mode=hash_mode,
                  only=only, start_from=start_from))
