#!/bin/bash
# Alternating COLD-run A/B: round-start worktree vs HEAD, modeling the
# driver's protocol (fresh bench.py process per sample, SPARKTAX_BENCH_REPEATS
# unset -> repeats=1, one warmup run first). Usage: r06_cold_ab.sh [pairs]
set -u
PAIRS=${1:-3}
OLD=/dev/shm/wt_r6start
NEW=/root/repo
OUT=/tmp/cold_ab
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32

run() { # dir tag
  cd "$1" || exit 1
  python bench.py 2>"$OUT/$2.err" | tail -1 > "$OUT/$2.json"
  uptime >> "$OUT/$2.box"
}

# one warmup per tree (populates OS page cache; mirrors the driver's warmup)
run "$OLD" warm_old
run "$NEW" warm_new
for i in $(seq 1 "$PAIRS"); do
  run "$OLD" "old_$i"
  run "$NEW" "new_$i"
done
echo DONE
