#!/bin/bash
# Round-5 endgame: run after the A/B arms complete (TPU free).
# Stages append to /tmp/endgame5/; safe to re-run individually.
# Usage: bash tools/round5_endgame.sh
set -x
cd /root/repo
mkdir -p /tmp/endgame5

ANCHOR=results_ladder/ladder_g000000
A_RUNGS=$(ls -d results_r5/armA/ladder_g* 2>/dev/null | sort)
B_RUNGS=$(ls -d results_r5/armB/ladder_g* 2>/dev/null | sort)

# every other rung + always the last, per arm (keeps the pool ~<=11 nets)
sel() { n=$(echo "$1" | wc -l); echo "$1" | awk -v n="$n" 'NR==n || NR%2==1'; }
SEL_A=$(sel "$A_RUNGS")
SEL_B=$(sel "$B_RUNGS")

# 1. ONE pooled Elo ranking: anchor + both arms' ladders (VERDICT item 2)
timeout 10800 python -m transgo_tpu.cli elo \
  --checkpoints $ANCHOR $SEL_A $SEL_B \
  --games 16 --sims 100 --prior 0.25 \
  > /tmp/endgame5/elo_ab.txt 2> /tmp/endgame5/elo_ab.err
echo "elo rc=$?"

# 2. strength gate, 64 games x 2 seeds on each arm's final rung
LAST_A=$(echo "$A_RUNGS" | tail -1)
LAST_B=$(echo "$B_RUNGS" | tail -1)
for CK in "$LAST_A" "$LAST_B"; do
  for SEED in 0 1; do
    NAME=$(basename "$(dirname "$CK")")_s$SEED
    timeout 3600 python -m transgo_tpu.cli strength --checkpoint "$CK" \
      --games 64 --seed $SEED > /tmp/endgame5/strength_$NAME.txt 2>&1
    echo "strength $NAME rc=$?"
  done
done

# 3. ladder reports (CPU)
timeout 300 python tools/ladder_report.py \
  --metrics results_r5/armA/metrics.jsonl > /tmp/endgame5/report_A.txt 2>&1
timeout 300 python tools/ladder_report.py \
  --metrics results_r5/armB/metrics.jsonl > /tmp/endgame5/report_B.txt 2>&1

# 4. final benchmark (headline + peak/MFU + b19 B-scaling + measured b3)
timeout 5400 python bench.py --all > /tmp/endgame5/bench_all.json \
  2> /tmp/endgame5/bench_all.err
echo "bench rc=$?"

tail -n +1 /tmp/endgame5/*.txt /tmp/endgame5/*.json
