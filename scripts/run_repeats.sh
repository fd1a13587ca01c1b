#!/usr/bin/env bash
# Repeated-run benchmark harness — the analog of the reference's
# scripts/utils/run_bag.sh (10 runs per bag under a timeout, collecting
# per-run artifacts for overlay plotting with plot_runs.py).
#
# Usage: scripts/run_repeats.sh [bag.npz ...]
#   With no args, a synthetic survey is generated first.
set -euo pipefail
cd "$(dirname "$0")/.."

RUNS=${RUNS:-10}
TIMEOUT=${TIMEOUT:-300}
OUTDIR=${OUTDIR:-runs}
mkdir -p "$OUTDIR"

BAGS=("$@")
if [ ${#BAGS[@]} -eq 0 ]; then
  BAG="$OUTDIR/survey.npz"
  [ -f "$BAG" ] || python scripts/simulate_bag.py --out "$BAG"
  BAGS=("$BAG")
fi

for BAG in "${BAGS[@]}"; do
  NAME=$(basename "$BAG" .npz)
  for i in $(seq 1 "$RUNS"); do
    echo "=== $NAME run $i/$RUNS ==="
    timeout "$TIMEOUT" python scripts/replay.py \
      --file "$BAG" --out "$OUTDIR/${NAME}_run${i}" --no-map || true
  done
done
echo "done; overlay with: python scripts/plot_runs.py $OUTDIR"
