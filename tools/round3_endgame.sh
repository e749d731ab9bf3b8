#!/bin/bash
# Round-3 endgame: run after the ladder training completes (TPU free).
# Each stage appends to /tmp/endgame/; safe to re-run stages individually.
set -x
mkdir -p /tmp/endgame
cd /root/repo

# 1. benchmark with all extras (headline + b19 + selfplay/train)
timeout 3600 python bench.py --all > /tmp/endgame/bench_all.json 2> /tmp/endgame/bench_all.err
echo "bench rc=$?"

# 2. segment-sum A/B (informational)
timeout 1800 python tools/bench_segsum.py > /tmp/endgame/segsum.txt 2>&1
echo "segsum rc=$?"

# 3. Elo ladder over the snapshots
timeout 5400 python -m transgo_tpu.cli elo \
  --checkpoints $(ls -d results_ladder/ladder_g* | sort) \
  --games 8 --sims 50 --prior 0.25 \
  > /tmp/endgame/elo.txt 2> /tmp/endgame/elo.err
echo "elo rc=$?"

# 4. strength gate on the final snapshot
LAST=$(ls -d results_ladder/ladder_g* | sort | tail -1)
timeout 1800 python -m transgo_tpu.cli strength --checkpoint "$LAST" \
  > /tmp/endgame/strength.txt 2>&1
echo "strength rc=$?"

# 5. ladder report (CPU)
timeout 300 python tools/ladder_report.py \
  --metrics results_ladder/metrics.jsonl --every 600 \
  > /tmp/endgame/ladder_report.txt 2>&1
echo "report rc=$?"
