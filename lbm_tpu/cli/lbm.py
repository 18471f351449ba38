"""CLI: run a D2Q9 lattice-Boltzmann simulation.

Usage:
    python -m lbm_tpu.cli.lbm --params params/input_128x128.params \
        --obstacles params/obstacles_128x128.dat [--engine jax|pallas]
        [--dtype float32|float64|bfloat16] [--device cpu|tpu] [--out-dir .]

The analogue of the reference driver CLIs (main/LbmAoS.cpp:224-245).
`--device cpu` + `--dtype float64` reproduces the golden data to ~1e-13.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native D2Q9 LBM")
    parser.add_argument("--params", required=True, help="7-line .params file")
    parser.add_argument("--obstacles", required=True, help="obstacle .dat file")
    parser.add_argument("--engine", default="jax", choices=["jax", "pallas"])
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "float64", "bfloat16"])
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"],
                        help="force a JAX platform (default: best available)")
    parser.add_argument("--num-steps", type=int, default=None,
                        help="override max_iters from the params file")
    parser.add_argument("--out-dir", default=".")
    args = parser.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from ..core.params import Obstacles, Params
    from ..models import lbm as lbm_model

    params = Params.from_file(args.params)
    obstacles = Obstacles.from_file(args.obstacles, params)
    dtype = {"float32": jnp.float32, "float64": jnp.float64, "bfloat16": jnp.bfloat16}[args.dtype]

    result = lbm_model.run_simulation(
        params, obstacles, dtype=dtype, engine=args.engine, num_steps=args.num_steps
    )
    lbm_model.print_summary(result)
    av_path, fs_path = lbm_model.write_outputs(result, params, obstacles, args.out_dir)
    print(f"wrote {av_path} and {fs_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
