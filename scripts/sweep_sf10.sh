#!/usr/bin/env bash
# One-command 100x engine-side scale sweep (r9): generate /tmp/sf10 (10x
# key-shifted /tmp/sf1, itself 10x sf0.1 — 60M lineitem, 500k documents,
# 200k vectors, multi-file tables) if absent, run EVERY SparkEntry query
# against it under a per-query wall-clock budget, and write the
# SCALE_sf10.json artifact (per-query secs/rows, or the failure line).
#
# This is the engine-side complement to scripts/verify_sf1.sh: at sf10
# the flat DuckDB oracles are out of reach (hours), so the claim checked
# here is "every contract query COMPLETES at 100x bench scale inside the
# budget, or its timeout is a documented deliberately-uncapped contract"
# — the 100 TB posture, measured rather than argued.
#
#   scripts/sweep_sf10.sh                 # all defaults
#   TIMEOUT=900 scripts/sweep_sf10.sh     # bigger per-query budget
#
# Env knobs: SF10_DIR (/tmp/sf10), SF1_DIR (/tmp/sf1), DEST
# (SCALE_sf10.json), TIMEOUT (600 s/query), SPARK_GRAFT_CPUS (16).
set -euo pipefail
cd "$(dirname "$0")/.."
SF10_DIR=${SF10_DIR:-/tmp/sf10}
SF1_DIR=${SF1_DIR:-/tmp/sf1}
DEST=${DEST:-SCALE_sf10.json}
TIMEOUT=${TIMEOUT:-600}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16}
LOG=${LOG:-/tmp/sweep_sf10.log}

# _GENMETA.json vintage check. GENV is read from the generator source
# itself (advisor r9: hand-synced copies drift), and the rm -rf refuses to
# touch a non-empty directory that lacks _GENMETA.json — a mistyped
# SF1_DIR/SF10_DIR pointing at real data must not be wiped.
GENV=$(grep -oE 'val genVersion = [0-9]+' src/test/scala/graft/GenSf1.scala | grep -oE '[0-9]+')
[ -n "$GENV" ] || { echo "[sweep_sf10] cannot read genVersion from GenSf1.scala" >&2; exit 1; }
regen_guard() { # $1 = corpus dir: exit unless it is absent/empty/generated
  # _GENSTART.json is the generator's FIRST write (advisor r10): a crashed
  # partial generation has it without _GENMETA.json and stays auto-wipable;
  # only a dir with NEITHER marker is treated as possibly-real user data
  if [ -e "$1" ] && [ ! -e "$1/_GENMETA.json" ] && [ ! -e "$1/_GENSTART.json" ] \
      && [ -n "$(ls -A "$1" 2>/dev/null)" ]; then
    echo "[sweep_sf10] refusing to delete $1: non-empty and not a generated corpus (no _GENMETA.json/_GENSTART.json; if it IS a dead partial gen, rm -rf it manually)" >&2
    exit 1
  fi
}
if ! grep -qs "\"gen_version\":$GENV," "$SF1_DIR/_GENMETA.json"; then
  regen_guard "$SF1_DIR"
  echo "[sweep_sf10] generating $SF1_DIR (10x key-shifted sf0.1; absent, partial, or stale vintage)"
  rm -rf "$SF1_DIR"
  sbt -batch "Test/runMain graft.GenSf1 $SF1_DIR"
fi
if ! grep -qs "\"gen_version\":$GENV," "$SF10_DIR/_GENMETA.json"; then
  regen_guard "$SF10_DIR"
  echo "[sweep_sf10] generating $SF10_DIR (10x key-shifted $SF1_DIR; absent, partial, or stale vintage)"
  rm -rf "$SF10_DIR"
  sbt -batch "Test/runMain graft.GenSf10 $SF10_DIR $SF1_DIR"
fi

echo "[sweep_sf10] running all queries at $SF10_DIR, ${TIMEOUT}s/query (log: $LOG)"
sbt -batch "runMain graft.RunQueries $SF10_DIR all - $TIMEOUT" 2>&1 | tee "$LOG"

python3 - "$LOG" "$DEST" "$SF10_DIR" "$TIMEOUT" <<'EOF'
import json, re, sys
log, dest, sf_dir, timeout = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
out, n_ok, n_to, n_fail = {}, 0, 0, 0
io_mbps = None
for line in open(log):
    m = re.match(r"IOCANARY mbps=([\d.-]+)", line)
    if m:
        io_mbps = float(m.group(1))
        continue
    m = re.match(r"OK\s+(\S+)\s+rows=(\d+)\s+([\d.]+)s", line)
    if m:
        out[m.group(1)] = {"status": "ok", "rows": int(m.group(2)),
                           "secs": float(m.group(3))}
        n_ok += 1
        continue
    m = re.match(r"FAIL\s+(\S+)\s+(.*)", line)
    if m:
        to = "TIMEOUT" in m.group(2)
        out[m.group(1)] = {"status": "timeout" if to else "fail",
                           "detail": m.group(2).strip()[:200]}
        n_to, n_fail = n_to + to, n_fail + (not to)
rec = {"_summary": {"sf_dir": sf_dir, "timeout_s": timeout,
                    "n_queries": len(out), "n_ok": n_ok,
                    "n_timeout": n_to, "n_fail": n_fail,
                    "io_canary_mbps": io_mbps}}
rec.update(dict(sorted(out.items())))
json.dump(rec, open(dest, "w"), indent=1)
print(f"[sweep_sf10] wrote {dest}: {n_ok} ok / {n_to} timeout / {n_fail} fail of {len(out)}")
EOF
