#!/bin/bash
# Round-5 curriculum A/B (VERDICT r4 item 2): does the 7x7 scale-bound
# pretrain + transfer window actually buy Elo, at EQUAL wall-clock budget?
#
# Two arms, same seed, same config, same total wall seconds:
#   arm A: 1500s 7x7 scale-bound pretrain -> transfer-assisted 9x9 for the
#          remaining budget (the reference's full curriculum,
#          configure.py:52/82-86)
#   arm B: the whole budget on plain 9x9 (no sub-model)
# Afterwards rank BOTH ladders + the shared untrained anchor in ONE pooled
# Elo run (tools/round5_endgame.sh).
#
# Usage: bash tools/round5_ab.sh [total_seconds] [batch]
set -x
cd /root/repo
SECS=${1:-7200}
B=${2:-1024}
mkdir -p results_r5

python tools/train_ladder.py --seconds $((SECS - 1500)) --pretrain 1500 \
  --snap-every 900 --batch "$B" --results ./results_r5/armA --seed 1 \
  --evaluate-num 1500 > results_r5/armA.log 2>&1
echo "armA rc=$?"

python tools/train_ladder.py --seconds "$SECS" --snap-every 900 \
  --batch "$B" --results ./results_r5/armB --seed 1 \
  --evaluate-num 1500 > results_r5/armB.log 2>&1
echo "armB rc=$?"
echo ABDONE
