"""CLI: run a D3Q19 3-D lattice-Boltzmann simulation.

The 3-D extension (BASELINE.json stretch config): lid-driven-style cavity
with an accelerated plane at z = nz-2 and wall planes at z = 0, nz-1.

Usage:
    python -m lbm_tpu.cli.lbm3d --nz 32 --ny 64 --nx 128 -n 1000
        [--omega 1.85] [--density 0.1] [--accel 0.005]
        [--device cpu|tpu] [--out-dir .]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native D3Q19 LBM")
    parser.add_argument("--nz", type=int, default=32)
    parser.add_argument("--ny", type=int, default=64)
    parser.add_argument("--nx", type=int, default=128)
    parser.add_argument("-n", "--num-steps", type=int, default=1000)
    parser.add_argument("--omega", type=float, default=1.85)
    parser.add_argument("--density", type=float, default=0.1)
    parser.add_argument("--accel", type=float, default=0.005)
    parser.add_argument("--engine", default="jax",
                        choices=["jax", "pallas", "pallas-inplace",
                                 "sharded", "sharded-pallas",
                                 "sharded-pallas-zy", "native"],
                        help="'native' = serial C++ host oracle "
                             "(native/d3q19_serial.cpp, no JAX); "
                             "'pallas-inplace' = aliased one-stream kernel "
                             "(fastest single-chip); 'sharded-pallas-zy' = "
                             "ghost-cell path on a (z, y) 2-AXIS device "
                             "mesh (see --mesh-shape)")
    parser.add_argument("--mesh-shape", type=int, nargs=2, default=None,
                        metavar=("NZ", "NY"),
                        help="sharded-pallas-zy only: devices along the z "
                             "and y mesh axes (default: auto-factorised "
                             "over all devices)")
    parser.add_argument("--overlap", action="store_true",
                        help="sharded-pallas only: overlap the ghost-plane "
                             "exchange with the interior kernel (even z "
                             "sharding, >= 3K planes/shard)")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="devices for --engine sharded (default: all)")
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    parser.add_argument("--out-dir", default=".")
    parser.add_argument("--checkpoint-every", type=int, default=None,
                        metavar="N",
                        help="write an atomic state checkpoint every N steps "
                             "(engines jax|pallas|pallas-inplace|native; "
                             "chunking is "
                             "bit-identical to an uninterrupted run)")
    parser.add_argument("--checkpoint", default=None, metavar="FILE",
                        help="checkpoint file (default: "
                             "<out-dir>/checkpoint_3d.npz)")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the checkpoint file if it exists")
    parser.add_argument("--final-state-slice", default=None, metavar="Z",
                        help="also write plane z=Z (or 'mid') in the exact "
                             "2-D final_state.dat format, consumable by "
                             "verify/check.py and cli/flow_viz.py")
    args = parser.parse_args(argv)

    import time
    from pathlib import Path

    import jax

    from ..utils.profiling import select_platform

    select_platform(args.device)

    import numpy as np

    from ..core import io
    from ..ops import d3q19

    cells = args.nz * args.ny * args.nx
    if args.overlap and args.engine != "sharded-pallas":
        parser.error("--overlap applies to --engine sharded-pallas only")
    if args.mesh_shape is not None and args.engine != "sharded-pallas-zy":
        parser.error("--mesh-shape applies to --engine sharded-pallas-zy "
                     "only")
    if args.engine == "sharded-pallas-zy" and (args.checkpoint_every
                                               or args.resume):
        parser.error("--checkpoint-every/--resume support engines "
                     "jax|pallas|native|sharded-pallas (use the z-mesh "
                     "sharded-pallas engine for checkpointed runs)")
    if args.overlap and (args.checkpoint_every or args.resume):
        parser.error("--overlap is not supported with checkpointed runs "
                     "(the chunked runner uses the fused exchange path)")
    if args.checkpoint_every or args.resume:
        if args.engine == "sharded":
            parser.error("--checkpoint-every/--resume support engines "
                         "jax|pallas|native|sharded-pallas (the implicit "
                         "'sharded' engine has no chunked runner — use "
                         "sharded-pallas)")
        from ..models import lbm3d as lbm3d_model

        ck = args.checkpoint or str(Path(args.out_dir) / "checkpoint_3d.npz")
        Path(ck).parent.mkdir(parents=True, exist_ok=True)
        f_final, av_np, dt, steps_run = (
            lbm3d_model.run_simulation_with_checkpoints(
                args.nz, args.ny, args.nx, num_steps=args.num_steps,
                checkpoint_path=ck,
                checkpoint_every=args.checkpoint_every or args.num_steps,
                omega=args.omega, density=args.density, accel=args.accel,
                engine=args.engine, resume=args.resume,
                num_devices=args.num_devices))
        av_np = np.asarray(av_np, np.float64)
        # dt covers the steps actually executed this invocation and (for
        # the jitted engines) includes their cold compile — label honestly
        time_label = "Time (this run, incl. compile)"
        mlups = steps_run * cells / dt / 1e6 if steps_run else 0.0
        if not steps_run:
            print(f"checkpoint already at step {args.num_steps} — "
                  "nothing to run")
    else:
        kw = dict(num_steps=args.num_steps, omega=args.omega,
                  density=args.density, accel=args.accel, engine=args.engine,
                  num_devices=args.num_devices, overlap=args.overlap,
                  mesh_shape=None if args.mesh_shape is None
                  else tuple(args.mesh_shape))
        if args.engine != "native":
            f_final, av = d3q19.simulate(args.nz, args.ny, args.nx, **kw)
            np.asarray(av)  # compile + warm (nothing to warm for native)
        t0 = time.perf_counter()
        f_final, av = d3q19.simulate(args.nz, args.ny, args.nx, **kw)
        av_np = np.asarray(av, np.float64)
        dt = time.perf_counter() - t0
        time_label = "Total compute time"
        mlups = args.num_steps * cells / dt / 1e6

    print("==done==")
    print(f"Final mean |u|:\t\t{av_np[-1]:.12E}")
    print(f"{time_label}:\t{dt:.6f} (s)")
    print(f"Total density:\t\t{float(np.asarray(f_final).sum(dtype=np.float64)):.6E}")
    print(f"MLUPS:\t\t\t{mlups:.1f}")

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    io.write_av_vels(out / "av_vels_3d.dat", av_np)
    print(f"wrote {out / 'av_vels_3d.dat'}")
    if args.final_state_slice is not None:
        from ..models import lbm3d as lbm3d_model

        z = (args.nz // 2 if args.final_state_slice == "mid"
             else int(args.final_state_slice))
        mask = np.zeros((args.nz, args.ny, args.nx), bool)
        mask[0] = mask[-1] = True  # the default wall planes of simulate()
        fs = out / f"final_state_3d_z{z}.dat"
        lbm3d_model.write_final_state_slice(fs, np.asarray(f_final), mask, z,
                                            args.density)
        print(f"wrote {fs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
