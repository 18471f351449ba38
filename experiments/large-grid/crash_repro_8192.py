"""Minimal repro of the 8192^2 XLA-engine TPU-worker crash.

DO NOT run this casually: on a v5e it kills the remote TPU worker
("UNAVAILABLE: TPU worker process crashed"), which on the tunnelled
single-chip setup here can wedge the device claim for hours (CLAUDE.md).
It exists so the failure is reproducible on request and so the fence in
lbm_tpu/ops/d2q9.py (_fence_chunks / CRASH_FENCE_*) has a committed
provenance.

Observed (round 3, TPU v5e via tunnel):
  * num_steps=496 (one scan dispatch): runs clean, ~1.2k MLUPS.
  * num_steps=2000 (one scan dispatch): worker crash. The fused jnp.roll
    step at 8192^2 f32 holds two 2.4 GB lattice buffers plus roll
    transients — near the HBM edge; the long-running single dispatch is
    what tips the worker over (496-step dispatches of the same body,
    re-issued back to back, run clean — that is the fence's mechanism).

Usage (explicit opt-in required):
    LBM_CRASH_REPRO=1 python experiments/large-grid/crash_repro_8192.py
By default (fence active) the same workload runs SAFELY in 496-step
dispatches, demonstrating the guard; with LBM_UNFENCED_SCAN=1 it issues
the crashing single 2000-step scan.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402


def main():
    if os.environ.get("LBM_CRASH_REPRO") != "1":
        print("refusing to run: set LBM_CRASH_REPRO=1 (this can crash the "
              "TPU worker when LBM_UNFENCED_SCAN=1 is also set)")
        return 2

    import jax.numpy as jnp

    from lbm_tpu.core import state
    from lbm_tpu.core.params import Params
    from lbm_tpu.ops import d2q9

    n = 8192
    p = Params(nx=n, ny=n, max_iters=2000, reynolds_dim=10,
               density=0.1, accel=0.005, omega=1.85)
    mask = np.zeros((n, n), bool)
    mask[0] = True
    f0 = jnp.asarray(state.initial_distributions(p, np.float32))
    fenced = os.environ.get("LBM_UNFENCED_SCAN") != "1"
    print(f"running 8192^2 x {p.max_iters} steps, fence "
          f"{'ACTIVE (safe chunked dispatches)' if fenced else 'DISABLED (expect worker crash)'}")
    f_final, av = d2q9.simulate(p, f0, jnp.asarray(mask))
    print("survived; av_vels[-1] =", float(np.asarray(av)[-1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
