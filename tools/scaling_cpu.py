"""Fused-path weak scaling on N virtual CPU devices (VERDICT r3 item 8).

One real TPU chip means true multi-chip scaling efficiency (BASELINE.md
>=80% target) cannot be measured here. This tool records the next-best
evidence: the PRODUCTION fused path (run_chunk + replicated device ring +
fused sample/train, sharded over a ``data`` mesh) at 1/2/4/8 *virtual CPU*
devices with per-device work held constant. It is a program-structure
sanity check — does the sharded program keep all shards busy, or does
something serialize? — NOT a performance truth: the N virtual devices
share this host's physical cores, so raw efficiency is bounded by
cores/N once N exceeds the core count (noted in the output).

Each device count runs in a fresh subprocess (the virtual-device count is
fixed at backend init). Prints one JSON line per N plus a summary table.

Usage: python tools/scaling_cpu.py            # parent: sweeps 1 2 4 8
       python tools/scaling_cpu.py --devices 4  # child: one measurement
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# per-device constant work (weak scaling): 16 boards + 32 train-batch rows
# per device, production 9x9 board, scaled-down search so a CPU run stays
# in minutes
BOARDS_PER_DEV = 16
TRAIN_PER_DEV = 32


def child(n: int, chunks: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= n

    from transgo_tpu.config import Config
    from transgo_tpu.parallel.mesh import make_mesh
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = Config(
        board_size=9,
        num_simulation=32,
        num_features=32,
        selfplay_batch=BOARDS_PER_DEV * n,
        batch_size=TRAIN_PER_DEV * n,
        buffer_size=65536,
        continuous_selfplay=True,
        selfplay_chunk_ticks=8,
        evaluate_num=10**9,
        results_path="/tmp/scaling_cpu",
    )
    mesh = (
        make_mesh((n,), ("data",), devices=jax.devices()[:n])
        if n > 1 else None
    )
    pipe = TrainPipeline(cfg, mesh=mesh, quiet=True)
    pipe.run_tick()        # compile
    pipe.run_tick()        # warm
    pipe.flush_pending()
    moves0 = pipe.now_play_steps
    t0 = time.time()
    for _ in range(chunks):
        pipe.run_tick()
    pipe.flush_pending()
    dt = time.time() - t0
    print(json.dumps({
        "devices": n,
        "boards": cfg.selfplay_batch,
        "chunks": chunks,
        "moves_per_s": round((pipe.now_play_steps - moves0) / dt, 2),
        "train_steps": pipe.now_train_steps,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="child mode: measure this device count")
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--sweep", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()
    if args.devices:
        child(args.devices, args.chunks)
        return

    ncpu = os.cpu_count() or 1
    rows = []
    for n in args.sweep:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--devices", str(n), "--chunks", str(args.chunks)],
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"n={n} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        rows.append(json.loads(line[-1]))
        print(line[-1], flush=True)

    if rows and rows[0]["devices"] == 1:
        base = rows[0]["moves_per_s"]
        print(f"\nweak scaling vs 1 device ({ncpu} physical cores — "
              f"efficiency is core-bound past n={ncpu}):")
        for r in rows:
            n = r["devices"]
            eff = r["moves_per_s"] / (base * n)
            print(f"  n={n}: {r['moves_per_s']:8.1f} moves/s  "
                  f"({r['boards']} boards)  eff={eff:.2f}")


if __name__ == "__main__":
    main()
