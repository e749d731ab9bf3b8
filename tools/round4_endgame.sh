#!/bin/bash
# Round-4 endgame: run after the flagship ladder completes (TPU free).
# Stages append to /tmp/endgame4/; safe to re-run individually.
# Usage: bash tools/round4_endgame.sh [results_dir]   (default results_r4)
set -x
RES=${1:-results_r4}
mkdir -p /tmp/endgame4
cd /root/repo

# 1. Elo ladder: every rung if <=10, else every other rung + always the
#    first and last; >=16 games/pairing at 100 sims (VERDICT r3 item 4)
RUNGS=$(ls -d "$RES"/ladder_g* | sort)
N=$(echo "$RUNGS" | wc -l)
if [ "$N" -gt 10 ]; then
  SEL=$(echo "$RUNGS" | awk -v n="$N" 'NR==1 || NR==n || NR%2==0')
else
  SEL=$RUNGS
fi
timeout 7200 python -m transgo_tpu.cli elo \
  --checkpoints $SEL --games 16 --sims 100 --prior 0.25 \
  > /tmp/endgame4/elo.txt 2> /tmp/endgame4/elo.err
echo "elo rc=$?"

# 2. strength gate on the final rung (16 games x 2 opponents, 50 sims)
LAST=$(echo "$RUNGS" | tail -1)
timeout 1800 python -m transgo_tpu.cli strength --checkpoint "$LAST" \
  > /tmp/endgame4/strength.txt 2>&1
echo "strength rc=$?"

# 3. depth-cap probe at 96 from the final rung (VERDICT item 6 contrast;
#    the flagship run itself is the depth-64 point)
timeout 2400 python tools/probe_depth.py --depth 96 --init "$LAST" \
  --seconds 180 > /tmp/endgame4/depth96.json 2> /tmp/endgame4/depth96.err
echo "depth96 rc=$?"

# 4. final benchmark with all extras (headline + b19 + train)
timeout 3600 python bench.py --all > /tmp/endgame4/bench_all.json \
  2> /tmp/endgame4/bench_all.err
echo "bench rc=$?"

# 5. ladder report (CPU)
timeout 300 python tools/ladder_report.py \
  --metrics "$RES"/metrics.jsonl > /tmp/endgame4/report.txt 2>&1
echo "report rc=$?"

tail -n +1 /tmp/endgame4/*.txt /tmp/endgame4/*.json
