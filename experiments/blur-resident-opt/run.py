"""Resident-blur kernel optimisation study: what does one blur pass cost in
VMEM, and which kernel formulation gets closest to the VPU roofline?

The reference's headline blur number is 899 us for 100x2 passes of bricks.png
on one IPU (half4, experiments/gaussian-blur-scaling/results.csv) = 4.5 us
per pass, possible because the image lives in tile SRAM the whole run. Our
resident engine (ops/stencil.blur_resident) is the same idea in VMEM: the
per-pass cost is pure VPU/VMEM work, so the variants below trade vector ops
and VMEM traffic:

  v0-roll      production kernel: separable (1 2 1) stages via pltpu.roll,
               final *(1/16), full interior-mask multiply, f32 ping-pong
  v1-concat    shifts via static slice+concat instead of pltpu.roll
  v2-rank2     (H, W*C) lane-packed layout (vertical = sublane shift,
               horizontal = lane roll by C); rank-2 arrays throughout
  v3-bf16      v0 with bf16 ping-pong buffers (half the VMEM traffic,
               f32 compute via casts)
  v4-folded    coefficients folded into the separable stages
               (0.25,0.5,0.25 twice) — no final scale multiply
  v5-ringzero  v4 + zero the pad ring explicitly instead of the full-array
               interior multiply
  v6-bf16-fold v3 + v4 + v5 stacked
  v7-bf16-arith bf16 ping-pong AND bf16 arithmetic; shifts via slice+concat
               (pltpu.roll needs 32-bit lanes)

Timing: ONE pallas_call per variant whose pass count is a runtime SMEM
scalar (dynamic fori_loop bound — no recompile per pass count). The host
tunnel adds ~160 ms latency with multi-ms jitter to every dispatch, so
per-pass cost = median over repeats of (t(hi) - t(lo)) / (hi - lo) with the
hi/lo spread sized to tens of milliseconds of device time, materialising
only a scalar checksum.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lbm_tpu.utils import profiling

profiling.enable_compilation_cache(os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", ".jax_cache"))


def _vmem_call(kernel, shape, dtype, scratch):
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
    )


def _pingpong(blur, n_ref, img_ref, out_ref, buf, state_dtype):
    buf[0] = img_ref[:].astype(state_dtype)

    def body(i, _):
        buf[1] = blur(buf[0])
        buf[0] = blur(buf[1])
        return 0

    jax.lax.fori_loop(0, n_ref[0] // 2, body, 0, unroll=False)
    out_ref[:] = buf[0].astype(out_ref.dtype)


def sh(x, d, axis):
    """Periodic shift by slice+concat (works for any dtype)."""
    pre = [slice(None)] * axis
    lead = tuple(pre + [slice(d, None) if d > 0 else slice(None, d)])
    tail = tuple(pre + [slice(None, d) if d > 0 else slice(d, None)])
    a, b = x[lead], x[tail]
    return jnp.concatenate([a, b] if d > 0 else [b, a], axis=axis)


# ---------------------------------------------------------------- variants
def v0_kernel(n_ref, img_ref, interior_ref, out_ref, buf):
    interior = interior_ref[:].astype(jnp.float32)[None]
    h, w = img_ref.shape[1], img_ref.shape[2]

    def blur(x):
        rows = pltpu.roll(x, h - 1, axis=1) + 2.0 * x + pltpu.roll(x, 1, axis=1)
        acc = pltpu.roll(rows, w - 1, axis=2) + 2.0 * rows + pltpu.roll(rows, 1, axis=2)
        return acc * (1.0 / 16.0) * interior

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.float32)


def v1_kernel(n_ref, img_ref, interior_ref, out_ref, buf):
    interior = interior_ref[:].astype(jnp.float32)[None]

    def blur(x):
        rows = sh(x, 1, 1) + 2.0 * x + sh(x, -1, 1)
        acc = sh(rows, 1, 2) + 2.0 * rows + sh(rows, -1, 2)
        return acc * (1.0 / 16.0) * interior

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.float32)


def v2_kernel(n_ref, img_ref, interior_ref, out_ref, buf, *, c):
    interior = interior_ref[:].astype(jnp.float32)
    h, wc = img_ref.shape

    def blur(x):
        rows = pltpu.roll(x, h - 1, axis=0) + 2.0 * x + pltpu.roll(x, 1, axis=0)
        acc = pltpu.roll(rows, wc - c, axis=1) + 2.0 * rows + pltpu.roll(rows, c, axis=1)
        return acc * (1.0 / 16.0) * interior

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.float32)


def v3_kernel(n_ref, img_ref, interior_ref, out_ref, buf):
    interior = interior_ref[:].astype(jnp.float32)[None]
    h, w = img_ref.shape[1], img_ref.shape[2]

    def blur(xb):
        x = xb.astype(jnp.float32)
        rows = pltpu.roll(x, h - 1, axis=1) + 2.0 * x + pltpu.roll(x, 1, axis=1)
        acc = pltpu.roll(rows, w - 1, axis=2) + 2.0 * rows + pltpu.roll(rows, 1, axis=2)
        return (acc * (1.0 / 16.0) * interior).astype(jnp.bfloat16)

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.bfloat16)


def v4_kernel(n_ref, img_ref, interior_ref, out_ref, buf):
    interior = interior_ref[:].astype(jnp.float32)[None]
    h, w = img_ref.shape[1], img_ref.shape[2]

    def blur(x):
        rows = 0.25 * (pltpu.roll(x, h - 1, axis=1) + pltpu.roll(x, 1, axis=1)) + 0.5 * x
        acc = 0.25 * (pltpu.roll(rows, w - 1, axis=2) + pltpu.roll(rows, 1, axis=2)) + 0.5 * rows
        return acc * interior

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.float32)


def _ring_mask(h, w, h0, w0):
    rr = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
    return (rr == 0) | (rr > h0) | (cc == 0) | (cc > w0)


def v5_kernel(n_ref, img_ref, interior_ref, out_ref, buf, *, h0, w0):
    h, w = img_ref.shape[1], img_ref.shape[2]
    ring = _ring_mask(h, w, h0, w0)
    zc = jnp.zeros((), jnp.float32)

    def blur(x):
        rows = 0.25 * (pltpu.roll(x, h - 1, axis=1) + pltpu.roll(x, 1, axis=1)) + 0.5 * x
        acc = 0.25 * (pltpu.roll(rows, w - 1, axis=2) + pltpu.roll(rows, 1, axis=2)) + 0.5 * rows
        return jnp.where(ring, zc, acc)

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.float32)


def v6_kernel(n_ref, img_ref, interior_ref, out_ref, buf, *, h0, w0):
    h, w = img_ref.shape[1], img_ref.shape[2]
    ring = _ring_mask(h, w, h0, w0)
    zc = jnp.zeros((), jnp.bfloat16)

    def blur(xb):
        x = xb.astype(jnp.float32)
        rows = 0.25 * (pltpu.roll(x, h - 1, axis=1) + pltpu.roll(x, 1, axis=1)) + 0.5 * x
        acc = 0.25 * (pltpu.roll(rows, w - 1, axis=2) + pltpu.roll(rows, 1, axis=2)) + 0.5 * rows
        return jnp.where(ring, zc, acc.astype(jnp.bfloat16))

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.bfloat16)


def v7_kernel(n_ref, img_ref, interior_ref, out_ref, buf, *, h0, w0):
    h, w = img_ref.shape[1], img_ref.shape[2]
    ring = _ring_mask(h, w, h0, w0)
    zc = jnp.zeros((), jnp.bfloat16)
    half = jnp.asarray(0.5, jnp.bfloat16)
    quarter = jnp.asarray(0.25, jnp.bfloat16)

    def blur(x):  # all-bf16 arithmetic; shifts by slice+concat
        rows = quarter * (sh(x, 1, 1) + sh(x, -1, 1)) + half * x
        acc = quarter * (sh(rows, 1, 2) + sh(rows, -1, 2)) + half * rows
        return jnp.where(ring, zc, acc)

    _pingpong(blur, n_ref, img_ref, out_ref, buf, jnp.bfloat16)


def build(variant, img, hw0):
    c, h, w = img.shape
    f32s = [pltpu.VMEM((2, c, h, w), jnp.float32)]
    bf16s = [pltpu.VMEM((2, c, h, w), jnp.bfloat16)]
    h0, w0 = hw0
    table = {
        "v0-roll": (v0_kernel, f32s, None),
        "v1-concat": (v1_kernel, f32s, None),
        "v2-rank2": (functools.partial(v2_kernel, c=c),
                     [pltpu.VMEM((2, h, w * c), jnp.float32)], "rank2"),
        "v3-bf16": (v3_kernel, bf16s, None),
        "v4-folded": (v4_kernel, f32s, None),
        "v5-ringzero": (functools.partial(v5_kernel, h0=h0, w0=w0), f32s, None),
        "v6-bf16-fold": (functools.partial(v6_kernel, h0=h0, w0=w0), bf16s, None),
        "v7-bf16-arith": (functools.partial(v7_kernel, h0=h0, w0=w0), bf16s, None),
    }
    kernel, scratch, layout = table[variant]
    if layout == "rank2":
        shape = (h, w * c)
    else:
        shape = img.shape
    return _vmem_call(kernel, shape, img.dtype, scratch), layout


def main():
    dtype = jnp.bfloat16
    shapes = {"bricks": ((4, 304, 512), (302, 499)),
              "leaf": ((4, 1032, 896), (1024, 768))}
    if len(sys.argv) > 1:
        shapes = {k: v for k, v in shapes.items() if k in sys.argv[1:]}
    variants = ["v0-roll", "v1-concat", "v2-rank2", "v3-bf16", "v4-folded",
                "v5-ringzero", "v6-bf16-fold", "v7-bf16-arith"]
    out_rows = ["image,platform,variant,us_per_pass,gvals_per_s,checksum"]
    for name, ((c, h, w), hw0) in shapes.items():
        rng = np.random.default_rng(0)
        interior_np = np.zeros((h, w), np.float32)
        interior_np[1:1 + hw0[0], 1:1 + hw0[1]] = 1
        img_np = rng.random((c, h, w)).astype(np.float32) * interior_np
        n_vals = c * h * w
        # hi - lo sized to >= ~60 ms of device time assuming ~300 Gval/s
        n_lo = 2000
        n_hi = n_lo + 2 * (max(4000, int(1.8e10 / n_vals)) // 2)
        for variant in variants:
            img = jnp.asarray(img_np, dtype)
            interior = jnp.asarray(interior_np, dtype)
            try:
                call, layout = build(variant, img, hw0)
                if layout == "rank2":
                    img_v = jnp.transpose(img, (1, 2, 0)).reshape(h, w * c)
                    int_v = jnp.repeat(interior, c, axis=1)
                else:
                    img_v, int_v = img, interior

                def run_once(n):
                    t0 = time.perf_counter()
                    out = call(jnp.asarray([n], jnp.int32), img_v, int_v)
                    s = float(jnp.sum(out.astype(jnp.float32)))
                    return time.perf_counter() - t0, s

                run_once(n_lo), run_once(n_hi)  # warm
                deltas = []
                s = None
                for _ in range(5):
                    t_lo, _ = run_once(n_lo)
                    t_hi, s = run_once(n_hi)
                    deltas.append((t_hi - t_lo) / (n_hi - n_lo))
                us = float(np.median(deltas)) * 1e6
                gv = n_vals / us / 1e3
                out_rows.append(f"{name},tpu,{variant},{us:.3f},{gv:.1f},{s:.6g}")
                print(f"{name:7s} {variant:14s} {us:8.2f} us/pass "
                      f"{gv:7.1f} Gval/s checksum={s:.6g}", flush=True)
            except Exception as e:
                print(f"{name:7s} {variant:14s} FAILED: {type(e).__name__}: {e}",
                      flush=True)
    suffix = "-".join(sys.argv[1:]) or "all"
    path = os.path.join(os.path.dirname(__file__), f"results-{suffix}.csv")
    with open(path, "w") as fh:
        fh.write("\n".join(out_rows) + "\n")
    print(f"wrote {path}")
    return True


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
