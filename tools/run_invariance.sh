#!/bin/bash
# Partitioning-invariance sweep: dump every gate via Verify under three
# session configs and diff the parquet dumps exactly (row order included).
#   A: the default correctness config (8 threads, shuffle=8)
#   B: adversarial partitioning — 3-wide shuffles, 64 KB input splits,
#      AQE off (different fold trees, different split boundaries)
#   C: broadcast joins disabled + 48-wide shuffles + AQE on (different
#      physical join strategies and runtime coalescing)
# Each run gets its OWN graft.index.workDir so persisted index snapshots
# are rebuilt under that run's config instead of reused across configs.
# Usage: tools/run_invariance.sh [sfdir]   (default /root/testdata/sf0.01)
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${INV_OUT:-/tmp/invariance}
rm -rf "$OUT"; mkdir -p "$OUT"

run() { # name extra-conf
  local wd="$OUT/wd_$1"
  mkdir -p "$wd"
  # the grep is display-filtering only — `|| true` keeps a no-match grep
  # from tripping `set -e`, while PIPESTATUS[0] still carries sbt's exit
  # so a Verify run that CRASHES mid-dump fails the sweep loudly instead
  # of silently shrinking the compared gate set (check_invariance.py's
  # oracle_sql.json manifest check is the second line of defense)
  SPARK_GRAFT_CPUS=8 \
  SPARK_GRAFT_CONF="graft.index.workDir=file://$wd${2:+;$2}" \
    sbt -batch "runMain graft.Verify $SF $OUT/$1" 2>&1 \
    | { grep -E "\[verify\]|error" || true; }
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "run $1: sbt/Verify exited $rc" >&2
    exit "$rc"
  fi
}

run a ""
run b "spark.sql.shuffle.partitions=3;spark.sql.files.maxPartitionBytes=65536;spark.sql.files.openCostInBytes=0;spark.sql.adaptive.enabled=false"
run c "spark.sql.shuffle.partitions=48;spark.sql.autoBroadcastJoinThreshold=-1;spark.sql.adaptive.autoBroadcastJoinThreshold=-1;spark.sql.adaptive.enabled=true"

echo "=== A vs B (narrow shuffles, tiny splits, no AQE) ==="
python tools/check_invariance.py "$OUT/a" "$OUT/b"
echo "=== A vs C (no broadcast, wide shuffles, AQE) ==="
python tools/check_invariance.py "$OUT/a" "$OUT/c"
