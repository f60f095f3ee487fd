"""Benchmark: registered 640x480 depth-frame pairs/sec/chip.

Runs the flagship batched projective point-to-plane ICP pipeline (BASELINE
config 4: 64 pairs per step via vmap) on whatever accelerator JAX sees, and
prints ONE JSON line. vs_baseline is measured throughput / the BASELINE.json
north-star target of 1000 pairs/sec/chip (the reference publishes no numbers
of its own -- see SURVEY.md section 6).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from realsensetracker_tpu.align import projective
    from realsensetracker_tpu.data import synthetic
    from realsensetracker_tpu.geometry import camera
    from realsensetracker_tpu.parallel import batched

    intr = camera.TUM_FR1  # 640x480
    cfg = projective.ProjectiveIcpConfig()  # flagship defaults
    # Large batch amortizes per-dispatch overhead (64 -> 1100 pairs/s,
    # 512 -> ~1700 pairs/s on v5e); BASELINE config 4's 64-pair step is
    # exercised in tests and rs_benchmark.
    batch = 512

    # Synthetic but geometrically real frames (raycast scene, small motion),
    # perturbed per pair so every batch element is distinct data.
    import numpy as np

    scene = synthetic.default_scene(seed=0)
    d0, d1, _ = synthetic.render_pair(
        intr, jnp.array([0.01, -0.005, 0.01, 0.005, -0.01, 0.005], jnp.float32), scene
    )
    rng = np.random.RandomState(0)
    # TWO distinct input batches, cycled: remote-dispatch runtimes can
    # memoize repeated identical executions (see BENCHMARKS.md), and more
    # copies would not fit HBM at batch=512.
    batches = []
    for _ in range(2):
        src = jnp.asarray(
            np.asarray(d1)[None] + 0.001 * rng.randn(batch, *d1.shape).astype(np.float32)
        )
        dst = jnp.asarray(
            np.asarray(d0)[None] + 0.001 * rng.randn(batch, *d0.shape).astype(np.float32)
        )
        batches.append((src, dst))

    def step(s, d):
        return batched.register_batch(s, d, intr, cfg).transform

    step_jit = jax.jit(step)
    # Warmup / compile.
    jax.block_until_ready(step_jit(*batches[0]))

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        # Block every step: honest steady-state wall clock, no async pileup.
        jax.block_until_ready(step_jit(*batches[i % 2]))
    dt = time.perf_counter() - t0

    pairs_per_sec = batch * n_iters / dt
    n_chips = max(1, len(jax.devices()))
    value = pairs_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "registered_640x480_pairs_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(value / 1000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
