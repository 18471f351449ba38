"""CLI: iterated 3x3 Gaussian blur over a PNG.

Usage:
    python -m lbm_tpu.cli.blur -i in.png -o out.png [-n 100]
        [--engine conv|pallas|resident|conv-sharded] [--num-devices N]
        [--data-type float|half] [--device cpu|tpu]
        [--compile-only [--export FILE]]

The analogue of the reference blur drivers' CLI
(main/GaussianBlurLowLevel.cpp:46-60, incl. its --compile-only AOT mode
:263-279). `--data-type half` maps to bfloat16 — the TPU's half-precision
format. `conv-sharded` runs on a device mesh (the 16-IPU scaling axis of
experiments/gaussian-blur-scaling).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native Gaussian blur")
    parser.add_argument("-i", "--image", required=True)
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("-n", "--num-iters", type=int, default=100,
                        help="number of iteration pairs (each = 2 blur passes)")
    parser.add_argument("--engine", default="conv",
                        choices=["conv", "pallas", "resident", "conv-sharded",
                                 "auto"],
                        help="auto = resident when the image fits VMEM, "
                             "else temporal-blocked banded pallas")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="devices for --engine conv-sharded (default: all)")
    parser.add_argument("--data-type", default="float",
                        choices=["float", "half", "float32", "bfloat16"])
    parser.add_argument("--band", type=int, default=None,
                        help="Pallas row-band height for --engine pallas "
                             "(the reference's --min-rows-per-tile analogue, "
                             "GaussianBlurLowLevel.cpp:51-54; default: "
                             "measured heuristic)")
    parser.add_argument("--k-passes", type=int, default=None,
                        help="--engine pallas: fuse this many blur passes "
                             "per HBM sweep (temporal blocking, <=8; must "
                             "divide 2*num_iters) — for images too large "
                             "for the resident engine")
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    parser.add_argument("--blur-alpha", action="store_true")
    parser.add_argument("--compile-only", action="store_true",
                        help="AOT-compile the blur step for this image's "
                             "shape and exit (no blur)")
    parser.add_argument("--export", default=None, metavar="FILE",
                        help="with --compile-only: serialise the compiled "
                             "step (reference: stencil_WxH.exe, "
                             "GaussianBlurLowLevel.cpp:263-279)")
    args = parser.parse_args(argv)

    import jax

    from ..utils.profiling import select_platform

    select_platform(args.device)

    import jax.numpy as jnp

    from ..models import blur

    dtype = jnp.bfloat16 if args.data_type in ("half", "bfloat16") else jnp.float32

    if args.compile_only:
        import numpy as np

        from ..ops import stencil
        from ..utils import image as img_lib, profiling

        rgba = img_lib.load_png(args.image)
        fimg = img_lib.to_float_image(rgba)
        # row_mult=32 matches the runtime path (models/blur.blur_image), so
        # the compiled/exported step targets the shape actually executed
        padded, interior, _ = img_lib.pad_to_tile(fimg.intensities,
                                                  row_mult=32)
        x = jnp.asarray(padded, dtype)
        inter = jnp.asarray(interior, dtype)

        def step_fn(img, interior_mask):
            return stencil.blur_step_conv(img, interior_mask)

        with profiling.timed("AOT compile"):
            compiled = profiling.aot_compile(step_fn, x, inter)
        print(f"flops/pass (XLA estimate): "
              f"{compiled.cost_analysis().get('flops', 0):.3e}")
        if args.export:
            nbytes = profiling.export_executable(step_fn, x, inter,
                                                 path=args.export)
            print(f"exported {nbytes} bytes to {args.export}")
        return 0

    if not args.output:
        parser.error("-o/--output is required unless --compile-only")
    seconds = blur.blur_file(
        args.image, args.output, num_iters=args.num_iters,
        engine=args.engine, dtype=dtype, blur_alpha=args.blur_alpha,
        num_devices=args.num_devices, band=args.band,
        k_passes=args.k_passes,
    )
    print(f"{args.num_iters}(x2) iterations took {seconds:.6f}s "
          f"({seconds * 1e6:.0f} us)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
