#!/usr/bin/env python3
"""Aggregate per-query sf1-scale oracle checks into a JSON artifact.

Runs scripts/check_one.py for each dumped query in a subprocess with a
wall-clock timeout (a flat DuckDB oracle can be unboundedly slow at sf1;
a timeout is RECORDED, never fatal), and records dump row counts for the
rows-only (no-oracle) contract entries. Output schema per query:
  {"status": pass|fail|error|timeout|no_oracle|missing, "secs": float,
   "spark_rows": int|None, "detail": last line of the check}
plus a "_summary" entry with the aggregate counts. "missing" = an oracle
is declared but Verify produced no dump dir (the engine query failed);
it counts as failing for the exit code.

Usage: python3 scripts/check_sf1.py <sfDir> <outDir> <destJson> [timeoutSec]
Exit 0 when nothing failed/errored/went missing (timeouts and
no_oracle are not failures — they are honest "not comparable within
budget" records).
"""
import json
import os
import subprocess
import sys
import time

import duckdb

SF_DIR, OUT_DIR, DEST = sys.argv[1], sys.argv[2], sys.argv[3]
TIMEOUT = int(sys.argv[4]) if len(sys.argv) > 4 else 900

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
dumped = set(d for d in os.listdir(OUT_DIR)
             if os.path.isdir(os.path.join(OUT_DIR, d)))
# the UNION of declared oracles and dump dirs, not the dump dirs alone:
# Verify deletes a crashed query's dump and exits 0, so iterating only
# dumps would let an engine regression silently vanish from the artifact
# (and a stale dir in a reused OUT_DIR would masquerade as a live query)
names = sorted(set(oracle) | dumped)
res = {}
for name in names:
    t0 = time.time()
    if name not in dumped:
        res[name] = {"status": "missing", "secs": None, "spark_rows": None,
                     "detail": "oracle declared but no dump dir — the "
                               "engine query failed inside Verify"}
    elif name not in oracle:
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{OUT_DIR}/{name}/*.parquet')"
        ).fetchone()[0]
        res[name] = {"status": "no_oracle", "secs": None,
                     "spark_rows": int(n),
                     "detail": "no oracle SQL declared for this dump"}
    else:
        try:
            p = subprocess.run(
                [sys.executable, "scripts/check_one.py", SF_DIR, OUT_DIR, name],
                capture_output=True, text=True, timeout=TIMEOUT)
            secs = round(time.time() - t0, 1)
            # detail from STDOUT (check_one's own verdict line): a trailing
            # library warning on stderr must not replace the PASS line
            lines = p.stdout.strip().splitlines() or p.stderr.strip().splitlines()
            detail = lines[-1] if lines else ""
            status = {0: "pass", 1: "fail", 2: "error"}.get(p.returncode, "error")
            rows = None
            if status == "pass" and "(" in detail:
                try:
                    rows = int(detail.rsplit("(", 1)[1].split(" ")[0])
                except ValueError:
                    pass
            res[name] = {"status": status, "secs": secs,
                         "spark_rows": rows, "detail": detail}
        except subprocess.TimeoutExpired:
            res[name] = {"status": "timeout", "secs": float(TIMEOUT),
                         "spark_rows": None,
                         "detail": f"oracle exceeded {TIMEOUT}s wall clock"}
    secs_str = "-" if res[name]["secs"] is None else f"{res[name]['secs']}s"
    print(f"[sf1] {name}: {res[name]['status']} ({secs_str})", flush=True)

counts = {}
for v in res.values():
    counts[v["status"]] = counts.get(v["status"], 0) + 1
summary = {"sf_dir": SF_DIR, "out_dir": OUT_DIR, "timeout_s": TIMEOUT,
           "n_queries": len(res), **{f"n_{k}": v for k, v in sorted(counts.items())}}
with open(DEST, "w") as f:
    json.dump({"_summary": summary, **res}, f, indent=1)
    f.write("\n")
print(f"[sf1] summary: {summary}")
bad = counts.get("fail", 0) + counts.get("error", 0) + counts.get("missing", 0)
sys.exit(0 if bad == 0 else 1)
