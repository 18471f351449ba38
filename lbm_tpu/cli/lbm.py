"""CLI: run a D2Q9 lattice-Boltzmann simulation.

Usage:
    python -m lbm_tpu.cli.lbm --params params/input_128x128.params \
        --obstacles params/obstacles_128x128.dat
        [--engine jax|pallas|pallas-manual|pallas-inplace|auto|sharded|sharded-pallas|native]
        [--dtype float32|float64|bfloat16] [--device cpu|tpu] [--out-dir .]
        [--num-devices N --strategy implicit|ppermute|allgather]
        [--compile-only] [--trace-dir DIR] [--cache-dir DIR]
        [--partition-json FILE] [--debug-nans]

The analogue of the reference driver CLIs (main/LbmAoS.cpp:224-245, plus the
AOT --compile-only mode of main/GaussianBlurLowLevel.cpp:263-279 and the
partitioning.json dump of main/LbmSimple.cpp:492).
`--device cpu --dtype float64` reproduces the golden data to ~1e-13.
"""

from __future__ import annotations

import argparse

# Must equal {'implicit'} | (halo.EXCHANGES.keys() - {'none'}) — locked by
# tests/test_cli.py::test_strategy_choices_match_halo_exchanges so the CLI
# and the library can't drift ('none' is a physically-wrong cost baseline
# deliberately not exposed here).
STRATEGY_CHOICES = ["implicit", "ppermute", "manytensors", "allgather",
                    "naive"]


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native D2Q9 LBM")
    parser.add_argument("--params", required=True, help="7-line .params file")
    parser.add_argument("--obstacles", default=None,
                        help="obstacle .dat file (not needed with "
                             "--compile-only: the exported step takes the "
                             "obstacle mask as a runtime argument)")
    parser.add_argument("--engine", default="jax",
                        choices=["jax", "pallas", "pallas-manual",
                                 "pallas-inplace", "auto", "sharded",
                                 "sharded-pallas", "native"],
                        help="compute path; 'native' is the serial C++ host "
                             "engine (the reference's lbm_cpu/compareLbm "
                             "analogue — no JAX, builds native/ on first "
                             "use); 'pallas-manual' is the explicitly "
                             "double-buffered pallas generation; 'auto' "
                             "picks the measured-best pallas generation "
                             "for the grid (d2q9_pallas.choose_engine)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "float64", "bfloat16"])
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"],
                        help="force a JAX platform (default: best available)")
    parser.add_argument("--num-steps", type=int, default=None,
                        help="override max_iters from the params file")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="devices for --engine sharded (default: all)")
    parser.add_argument("--strategy", default="ppermute",
                        choices=STRATEGY_CHOICES,
                        help="halo-exchange strategy for --engine sharded "
                             "(rejected by --engine sharded-pallas unless "
                             "ppermute)")
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--compile-only", action="store_true",
                        help="AOT-compile the step and exit (no simulation)")
    parser.add_argument("--export", default=None, metavar="FILE",
                        help="with --compile-only: serialise the compiled "
                             "step for lbm_runner (the AOT-split analogue)")
    parser.add_argument("--trace-dir", default=None,
                        help="capture a jax.profiler trace of the run")
    parser.add_argument("--cache-dir", default=None,
                        help="persistent compilation-cache directory")
    parser.add_argument("--partition-json", default=None,
                        help="dump the device partitioning as JSON")
    parser.add_argument("--debug-nans", action="store_true",
                        help="trap NaNs (FP-exception analogue)")
    parser.add_argument("--checkpoint-every", type=int, default=None,
                        metavar="N",
                        help="write an atomic state checkpoint every N steps "
                             "(all engines; chunking is bit-identical to an "
                             "uninterrupted run of the same engine config)")
    parser.add_argument("--checkpoint", default=None, metavar="FILE",
                        help="checkpoint file (default: "
                             "<out-dir>/checkpoint.npz)")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the checkpoint file if it exists")
    parser.add_argument("--overlap", action="store_true",
                        help="sharded-pallas only: overlap the row-ghost "
                             "exchange with the interior kernel (even row "
                             "sharding, >= 24 rows/shard)")
    args = parser.parse_args(argv)
    if args.overlap and args.engine != "sharded-pallas":
        parser.error("--overlap applies to --engine sharded-pallas only")
    if args.overlap and (args.checkpoint_every or args.resume):
        parser.error("--overlap is not supported with checkpointed runs")

    import contextlib

    import jax

    from ..utils.profiling import select_platform

    select_platform(args.device)
    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from ..core.params import Obstacles, Params
    from ..models import lbm as lbm_model
    from ..utils import profiling

    if args.cache_dir:
        profiling.enable_compilation_cache(args.cache_dir)
    if args.debug_nans:
        profiling.enable_nan_debugging()

    params = Params.from_file(args.params)
    if args.obstacles is None and not args.compile_only:
        parser.error("--obstacles is required unless --compile-only")
    obstacles = (Obstacles.from_file(args.obstacles, params)
                 if args.obstacles else None)
    dtype = {"float32": jnp.float32, "float64": jnp.float64,
             "bfloat16": jnp.bfloat16}[args.dtype]

    if args.partition_json:
        from ..parallel import partition

        n = args.num_devices or len(jax.devices())
        part = partition.partition_for_devices(params.ny, params.nx, n)
        partition.serialize_to_json(part, args.partition_json)
        print(f"wrote {args.partition_json}")

    if args.compile_only:
        from ..core import state
        from ..ops import d2q9

        # The obstacle mask is a RUNTIME argument of the compiled step: one
        # exported executable serves any obstacle file of this grid size
        # (the reference's AOT split compiles with "no obstacles needed to
        # build!", main/LbmPoplibs.cpp:252, and streams them in the runner,
        # :376-389 + main/LbmRunner.cpp:81-88).
        aw = d2q9.AccelWeights.from_params(params)
        f0 = jnp.asarray(state.initial_distributions(params, np.dtype(dtype)))
        mask_spec = jnp.zeros((params.ny, params.nx), bool)
        amask = d2q9.accel_row_mask(params.ny, params.nx, params.ny - 2,
                                    dtype=f0.dtype)

        def step_fn(f, mask):
            return d2q9.step(f, mask, amask, omega=params.omega,
                             accel_w1=aw.w1, accel_w2=aw.w2)

        with profiling.timed("AOT compile"):
            compiled = profiling.aot_compile(step_fn, f0, mask_spec)
        print(f"flops/step (XLA estimate): {compiled.cost_analysis().get('flops', 0):.3e}")
        if args.export:
            nbytes = profiling.export_executable(step_fn, f0, mask_spec,
                                                 path=args.export)
            print(f"exported {nbytes} bytes to {args.export}")
        return 0

    trace_ctx = (profiling.trace(args.trace_dir) if args.trace_dir
                 else contextlib.nullcontext())
    with trace_ctx:
        if args.checkpoint_every or args.resume:
            from pathlib import Path as _Path

            ck = args.checkpoint or str(_Path(args.out_dir) / "checkpoint.npz")
            _Path(ck).parent.mkdir(parents=True, exist_ok=True)
            result = lbm_model.run_simulation_with_checkpoints(
                params, obstacles, dtype=dtype, engine=args.engine,
                checkpoint_path=ck,
                checkpoint_every=args.checkpoint_every or params.max_iters,
                resume=args.resume, num_steps=args.num_steps,
                strategy=args.strategy, num_devices=args.num_devices,
            )
        elif args.engine in ("sharded", "sharded-pallas"):
            result = lbm_model.run_simulation_sharded(
                params, obstacles, dtype=dtype, strategy=args.strategy,
                engine=args.engine, num_devices=args.num_devices,
                num_steps=args.num_steps, overlap=args.overlap,
            )
        else:
            result = lbm_model.run_simulation(
                params, obstacles, dtype=dtype, engine=args.engine,
                num_steps=args.num_steps,
            )
    lbm_model.print_summary(result)
    av_path, fs_path = lbm_model.write_outputs(result, params, obstacles, args.out_dir)
    print(f"wrote {av_path} and {fs_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
