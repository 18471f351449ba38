"""CLI: run a previously-exported LBM step executable.

The analogue of the reference's AOT split (lbm_poplibs compiles + serialises
an executable, lbm_runner deserialises and runs it —
main/LbmPoplibs.cpp:376-389, main/LbmRunner.cpp). Produce the executable with
`python -m lbm_tpu.cli.lbm ... --compile-only --export step.jaxexe`.

Usage:
    python -m lbm_tpu.cli.lbm_runner --exe step.jaxexe \
        --params input.params --obstacles obstacles.dat [--out-dir .]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="run an exported LBM step")
    parser.add_argument("--exe", required=True, help="exported .jaxexe file")
    parser.add_argument("--params", required=True)
    parser.add_argument("--obstacles", required=True)
    parser.add_argument("--num-steps", type=int, default=None)
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    parser.add_argument("--out-dir", default=".")
    args = parser.parse_args(argv)

    import time

    import jax

    from ..utils.profiling import select_platform

    select_platform(args.device)

    import jax.numpy as jnp
    import numpy as np

    from ..core import state
    from ..core.params import Obstacles, Params, reynolds_number
    from ..models import lbm as lbm_model
    from ..models.lbm import LbmResult
    from ..ops import d2q9
    from ..utils import profiling

    params = Params.from_file(args.params)
    obstacles = Obstacles.from_file(args.obstacles, params)
    num_steps = args.num_steps if args.num_steps is not None else params.max_iters

    exe = profiling.load_executable(args.exe)
    aw = d2q9.AccelWeights.from_params(params)
    f0 = jnp.asarray(state.initial_distributions(params, np.float32))
    mask = jnp.asarray(obstacles.mask)
    f0 = d2q9.first_accelerate(f0, mask, accel_row=params.ny - 2,
                               accel_w1=aw.w1, accel_w2=aw.w2)

    @jax.jit
    def run(f):
        # the exported step takes the obstacle mask as a runtime argument:
        # one .jaxexe serves any obstacle file (reference: LbmRunner.cpp:81-88
        # streams obstacles into a pre-compiled executable)
        def body(carry, _):
            f_new, tot = exe.call(carry, mask)
            return f_new, tot

        return jax.lax.scan(body, f, None, length=num_steps)

    f_final, tot = run(f0)
    np.asarray(tot)  # compile+warm
    t0 = time.perf_counter()
    f_final, tot = run(f0)
    tot_np = np.asarray(tot, np.float64)
    seconds = time.perf_counter() - t0

    av = tot_np / float((~obstacles.mask).sum())
    f_np = np.asarray(f_final)
    result = LbmResult(
        f_final=f_np, av_vels=av, compute_seconds=seconds,
        reynolds=reynolds_number(params, float(av[-1])),
        total_density=state.total_density(f_np),
    )
    lbm_model.print_summary(result)
    av_path, fs_path = lbm_model.write_outputs(result, params, obstacles, args.out_dir)
    print(f"wrote {av_path} and {fs_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
