#!/usr/bin/env python3
"""Local stand-in for the driver's correctness check: run graft.Verify output
against the DuckDB oracle SQL and compare values exactly (sorted columns,
sorted rows). Usage: check_oracle.py <sfDir> <verifyOutDir>"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = 0, 0
for name, sql in sorted(oracles.items()):
    try:
        grel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        gcols = list(grel.columns)
        gtypes = {c: str(t) for c, t in zip(grel.columns, grel.types)}
        got = grel.fetchall()
        wrel = con.sql(sql)
        wcols = list(wrel.columns)
        wtypes = {c: str(t) for c, t in zip(wrel.columns, wrel.types)}
        want = wrel.fetchall()
    except Exception as e:
        print(f"FAIL {name}: exec error {e}")
        bad += 1
        continue
    if sorted(gcols) != sorted(wcols):
        print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(wcols)}")
        bad += 1
        continue
    # the driver's hash is TYPE-sensitive (e.g. DuckDB SUM(BIGINT) returns
    # HUGEINT) — a value-equal result with a differently-typed oracle column
    # still fails the driver, so flag type drift here too.
    tdrift = [(c, gtypes[c], wtypes[c]) for c in sorted(gcols)
              if gtypes[c] != wtypes[c]]
    if tdrift:
        print(f"FAIL {name}: result-type drift (engine vs oracle): {tdrift}")
        bad += 1
        continue
    gi = [gcols.index(c) for c in sorted(gcols)]
    wi = [wcols.index(c) for c in sorted(wcols)]
    g = sorted([tuple(r[i] for i in gi) for r in got])
    w = sorted([tuple(r[i] for i in wi) for r in want])
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} != {len(w)}")
        bad += 1
        continue
    mismatch = None
    for rg, rw in zip(g, w):
        for a, b in zip(rg, rw):
            same = (a == b) or (a is None and b is None)
            if not same and isinstance(a, float) and isinstance(b, float):
                same = (math.isnan(a) and math.isnan(b)) or a == b
            if not same:
                mismatch = (rg, rw)
                break
        if mismatch:
            break
    if mismatch:
        print(f"FAIL {name}: first mismatch\n  got  {mismatch[0]}\n  want {mismatch[1]}")
        bad += 1
    else:
        print(f"OK   {name} ({len(g)} rows)")
        ok += 1
# rows-only queries (no oracle)
import glob, os
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracles:
        try:
            n = con.execute(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
        except Exception as e:
            print(f"ROWS {name}: read error {e}")
print(f"\n{ok} ok, {bad} bad")
sys.exit(1 if bad else 0)
