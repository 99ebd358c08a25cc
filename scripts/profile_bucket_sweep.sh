#!/bin/sh
# On-chip cost attribution sweep for the bucket kernel: one process per
# ablation combo (VKGS_ABLATE is read when the lru_cached pallas_call
# builder first runs, so combos cannot share a process).
#
# Usage: scripts/profile_bucket_sweep.sh [caps] [n_splats]
#   e.g. scripts/profile_bucket_sweep.sh 768,384,640,256 1000000
#
# Reads each stage's cost by differencing against the full kernel; the
# first run also populates /tmp/bins_cache_* so later combos skip binning.
cd "$(dirname "$0")/.."
CAPS="${1:-768,384,640,256}"
N="${2:-1000000}"
# the tunneled device intermittently reports FAILED_PRECONDITION for a
# fresh client right after another exits; retry each combo with a cooldown
for ABL in "" merge blend merge,blend dma,merge,blend \
           dma,assembly,keys,merge,blend,output; do
  for try in 1 2 3; do
    if VKGS_ABLATE="$ABL" python scripts/profile_bucket_overhead.py \
        "$CAPS" "$N"; then break; fi
    echo "combo [$ABL] try $try failed; cooling down" >&2
    sleep 120
  done
done
