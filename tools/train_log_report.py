"""Summarize a training run from its log_train.txt (QUALITY_r* evidence).

Parses the train CLI's log lines (cli/train.py: per-print_every step stats,
per-train_render_every test metrics, checkpoint saves, resume markers) and
prints the fields the round-4 verdict asked a full-length run to record:
final/best test PSNR/SSIM, the LR tail (recomputed from the schedule at the
logged steps), rays/s stability over the run, and loss continuity across a
kill+resume (reference usage pattern: train.py:97-100,310-313).

Usage:
  python tools/train_log_report.py runs/canonical30k/log_train.txt \
      --max-steps 30000 --lr-delay-steps 5000
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEP_RE = re.compile(
    r"step (\d+)/(\d+): loss=([\d.eE+-]+) psnr=([\d.eE+-]+) (\d+) rays/s")
TEST_RE = re.compile(r"test render (\d+): psnr=([\d.eE+-]+) ssim=([\d.eE+-]+)")
CKPT_RE = re.compile(r"checkpoint saved at step (\d+)")
RESUME_RE = re.compile(r"resumed from step (\d+)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log")
    p.add_argument("--max-steps", type=int, default=30000)
    p.add_argument("--lr-delay-steps", type=int, default=5000)
    p.add_argument("--lr-init", type=float, default=1e-2)
    p.add_argument("--lr-final", type=float, default=1e-3)
    args = p.parse_args()

    steps, losses, rays = [], [], []
    tests = []  # (preceding train step, psnr, ssim)
    ckpts, resumes = [], []
    for line in open(args.log):
        m = STEP_RE.search(line)
        if m:
            steps.append(int(m.group(1)))
            losses.append(float(m.group(3)))
            rays.append(float(m.group(5)))
            continue
        m = TEST_RE.search(line)
        if m:
            tests.append((steps[-1] if steps else 0, float(m.group(2)),
                          float(m.group(3))))
            continue
        m = CKPT_RE.search(line)
        if m:
            ckpts.append(int(m.group(1)))
            continue
        m = RESUME_RE.search(line)
        if m:
            resumes.append(int(m.group(1)))

    if not steps:
        sys.exit(f"no step lines found in {args.log}")

    steps_a, losses_a, rays_a = map(np.asarray, (steps, losses, rays))
    print(f"steps logged: {steps_a[0]}..{steps_a[-1]} "
          f"({len(steps_a)} windows), checkpoints: {len(ckpts)} "
          f"(last {ckpts[-5:] if ckpts else []})")

    # rays/s stability: exclude windows containing a render/ckpt stall
    # (cheap heuristic: below 60% of the run median).
    med = float(np.median(rays_a))
    clean = rays_a[rays_a > 0.6 * med]
    print(f"train rays/s: median {med:.0f}, clean-window mean "
          f"{clean.mean():.0f} +- {clean.std():.0f} "
          f"({len(clean)}/{len(rays_a)} windows; min {rays_a.min():.0f} "
          f"during render/ckpt stalls)")

    if tests:
        best = max(tests, key=lambda t: t[1])
        print(f"test renders: {len(tests)}; final (step ~{tests[-1][0]}) "
              f"psnr={tests[-1][1]:.2f} ssim={tests[-1][2]:.3f}; "
              f"best psnr={best[1]:.2f} at step ~{best[0]}")
        tail = [t for t in tests if t[0] >= 0.8 * args.max_steps]
        if tail:
            print("LR-tail renders (last 20% of schedule): " + ", ".join(
                f"{t[0]}:{t[1]:.2f}" for t in tail))

    # LR schedule values at landmark steps (mirrors train/state.py).
    from ucnerf_tpu.ops import mathx
    for s in [1, args.lr_delay_steps // 2, args.lr_delay_steps,
              args.max_steps // 2, args.max_steps]:
        lr = float(mathx.learning_rate_decay(
            s, args.lr_init, args.lr_final, args.max_steps,
            args.lr_delay_steps, lr_delay_mult=1e-8))
        print(f"  lr({s}) = {lr:.2e}")

    for r in resumes:
        # Loss continuity: compare the last windows before the resume point
        # with the first ones after (same step range, pre/post restart).
        pre = losses_a[(steps_a <= r)][-3:]
        post = losses_a[(steps_a > r)][:3]
        print(f"resume at step {r}: pre-kill losses {np.round(pre, 4)} -> "
              f"post-resume {np.round(post, 4)} "
              f"({'continuous' if post.size and pre.size and post[0] < 2 * pre[-1] else 'CHECK'})")
    if not resumes:
        print("no resume events in this log")


if __name__ == "__main__":
    main()
