"""Checkpoint averaging for AVSR (and any orbax-saved param pytree).

Counterpart of /root/reference/examples/avsr/average_checkpoints.py:6-33,
which element-averages the last N Lightning ``.ckpt`` state dicts before
evaluation.  Here the checkpoints are orbax steps written by ``train.py
--checkpoint-dir``; the average is a pytree map and the result is saved as a
new step (default ``step=10**9``) in the same directory so ``eval.py
--checkpoint-dir ... --step 1000000000`` picks it up.

    python average_checkpoints.py --checkpoint-dir ckpts --last 10
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def average_checkpoints(states):
    """Element-wise mean of param pytrees (float leaves averaged, int floored
    like the reference's ``//= len(last)``)."""
    n = len(states)

    def avg(*leaves):
        acc = np.asarray(leaves[0], np.float64)
        for leaf in leaves[1:]:
            acc = acc + np.asarray(leaf, np.float64)
        first = np.asarray(leaves[0])
        if np.issubdtype(first.dtype, np.floating):
            return (acc / n).astype(first.dtype)
        return (acc // n).astype(first.dtype)

    return jax.tree.map(avg, *states)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--last", type=int, default=10)
    p.add_argument("--out-step", type=int, default=10**9)
    args = p.parse_args()

    from audio_tpu.utils import CheckpointManager

    mgr = CheckpointManager(args.checkpoint_dir, max_to_keep=args.last + 2)
    steps = sorted(mgr.all_steps())[-args.last:]
    if not steps:
        raise SystemExit(f"no checkpoints under {args.checkpoint_dir}")
    states = [mgr.restore(s) for s in steps]
    merged = dict(states[-1])
    merged["params"] = average_checkpoints([s["params"] for s in states])
    mgr.save(args.out_step, merged, force=True)
    print(f"averaged {len(steps)} checkpoints {steps} -> step {args.out_step}")


if __name__ == "__main__":
    main()
