"""CLI: iterated 3x3 Gaussian blur over a PNG.

Usage:
    python -m lbm_tpu.cli.blur -i in.png -o out.png [-n 100]
        [--engine conv|pallas] [--data-type float|half] [--device cpu|tpu]

The analogue of the reference blur drivers' CLI
(main/GaussianBlurLowLevel.cpp:46-60). `--data-type half` maps to bfloat16 —
the TPU's half-precision format.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="TPU-native Gaussian blur")
    parser.add_argument("-i", "--image", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("-n", "--num-iters", type=int, default=100,
                        help="number of iteration pairs (each = 2 blur passes)")
    parser.add_argument("--engine", default="conv", choices=["conv", "pallas", "resident"])
    parser.add_argument("--data-type", default="float",
                        choices=["float", "half", "float32", "bfloat16"])
    parser.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    parser.add_argument("--blur-alpha", action="store_true")
    args = parser.parse_args(argv)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    import jax.numpy as jnp

    from ..models import blur

    dtype = jnp.bfloat16 if args.data_type in ("half", "bfloat16") else jnp.float32
    seconds = blur.blur_file(
        args.image, args.output, num_iters=args.num_iters,
        engine=args.engine, dtype=dtype, blur_alpha=args.blur_alpha,
    )
    print(f"{args.num_iters}(x2) iterations took {seconds:.6f}s "
          f"({seconds * 1e6:.0f} us)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
