"""Summarize a training run's metrics.jsonl: throughput, loss trajectory,
gate promotions — the table backing the README's end-to-end learning
section. Pure host-side; no device use.

Usage: python tools/ladder_report.py [--metrics results_ladder/metrics.jsonl]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="results_ladder/metrics.jsonl")
    ap.add_argument("--every", type=float, default=1800,
                    help="row cadence in run seconds")
    args = ap.parse_args()

    rows = []
    with open(args.metrics) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        print("no metrics")
        return

    # gate rows (one per arena eval) interleave with throughput rows —
    # split by key presence
    gates = [r for r in rows if "gate_win_ratio" in r]
    rows = [r for r in rows if "now_play_games" in r]
    if not rows:
        print("no throughput rows")
        return

    def t_of(r):
        # cum_seconds is monotone across resumes; fall back to the
        # process-local t for pre-r3 logs
        return r.get("cum_seconds", r["t"])

    print(f"{'t(min)':>7} {'games':>6} {'play':>9} {'train':>7} "
          f"{'ratio':>6} {'lr':>8} {'loss':>6} {'policy':>6} "
          f"{'value':>6} {'own':>6} {'mv/s':>6}")
    next_t = 0.0
    for r in rows:
        if t_of(r) >= next_t or r is rows[-1]:
            next_t = t_of(r) + args.every
            print(
                f"{t_of(r) / 60:7.0f} {int(r['now_play_games']):6d} "
                f"{int(r['now_play_steps']):9d} "
                f"{int(r['now_train_steps']):7d} "
                f"{r['train_play_ratio']:6.3f} {r['learn_rate']:8.1e} "
                f"{r.get('total_loss', float('nan')):6.3f} "
                f"{r.get('act_policy_loss', float('nan')):6.3f} "
                f"{r.get('value_loss', float('nan')):6.3f} "
                f"{r.get('own_loss', float('nan')):6.3f} "
                f"{r.get('play_steps_per_s', float('nan')):6.1f}"
            )
    last = rows[-1]
    dt = t_of(last) - t_of(rows[0])
    print(
        f"\ntotals: {int(last['now_play_games'])} games, "
        f"{int(last['now_play_steps'])} moves, "
        f"{int(last['now_train_steps'])} train steps in {dt / 60:.0f} min "
        f"({last['now_play_games'] / max(dt / 3600, 1e-9):.0f} games/h, "
        f"avg {last['now_play_steps'] / max(dt, 1e-9):.1f} moves/s "
        f"interleaved)"
    )
    # game-completion smoothness (VERDICT r3 weak #3 / r4 stagger_init):
    # the longest run of consecutive telemetry rows with a frozen games
    # counter, in ticks. Wave-synced starts held games flat for ~200 ticks
    # at B=256 in round 3; the desynced run should stay well under 50.
    started = [r for r in rows if r["now_play_games"] > 0]
    plateau, cur = 0, 0
    for a, b in zip(started, started[1:]):
        dt_ticks = int(b["step"] - a["step"])
        if dt_ticks < 0:
            # crash-resume segment boundary from a fresh process (tick
            # restarts at 0): reset the running count instead of letting a
            # negative delta corrupt it (ADVICE r4)
            cur = 0
            continue
        if b["now_play_games"] == a["now_play_games"]:
            cur += dt_ticks
            plateau = max(plateau, cur)
        else:
            cur = 0
    if started:
        print(f"longest games-counter plateau after first game: "
              f"{plateau} ticks at telemetry cadence "
              f"(r3 wave-synced runs: ~200; desynced target: no plateau "
              f"at the 100-tick row cadence)")
    if gates:
        print(f"\ngate timeline ({len(gates)} evals):")
        print(f"{'tick':>7} {'games':>6} {'train':>7} {'win_ratio':>9} "
              f"{'score':>6} {'promoted':>8}")
        for g in gates:
            print(
                f"{int(g['step']):7d} {int(g.get('gate_games', -1)):6d} "
                f"{int(g.get('gate_train_steps', -1)):7d} "
                f"{g['gate_win_ratio']:9.2f} "
                f"{int(g['gate_score']):6d} "
                f"{'yes' if g.get('gate_promote') else 'no':>8}"
            )


if __name__ == "__main__":
    main()
