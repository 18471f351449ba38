#!/usr/bin/env python3
"""Probe: can a manually double-buffered Pallas kernel overlap DMA with
compute where the automatic pallas_call pipeline measures ZERO overlap?

Background (experiments/d2q9-breakdown): at the non-resident D2Q9 grids the
production K-step kernel's wall time is exactly copy + compute — the Mosaic
pipeline is not hiding the HBM band traffic behind the BGK math, leaving
~35% of the wall on the table at 4096^2 (perfect overlap would be ~17.9k
MLUPS vs the measured 11.6k). This probe separates the QUESTION from the
production kernel with two tiny kernels of identical traffic:

  auto    - plain pallas_call, grid over row bands, kernel = R rounds of
            synthetic VPU work on the block (R=0 -> pure pipeline copy).
  manual  - grid=(), refs in ANY memory space, explicit double-buffered
            make_async_copy in/out per band (the pallas guide's pattern),
            same R-round body.

For each engine we fit wall(R) ~ intercept + slope*R. Zero overlap shows up
as wall(R) = copy + compute; full overlap as wall(R) = max(copy, compute).
The manual-vs-auto R=0 rows also measure whether fewer/bigger DMA
descriptors lift the ~300 GB/s band-streaming floor itself.

Run on the real TPU:  python experiments/d2q9-overlap/probe.py
"""

import argparse
import functools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
VMEM_LIMIT = 110 * 1024 * 1024


def _work(x, rounds: int):
    # synthetic VPU work: `rounds` dependent FMAs on the whole block
    for i in range(rounds):
        x = x * 1.0001 + 0.0001
    return x


@functools.lru_cache(maxsize=32)
def build_auto(ny: int, nx: int, band: int, rounds: int,
               interpret: bool = False, features: frozenset = frozenset()):
    """Automatic pipeline: the same structure as the production kernel's
    main band block. `features` re-adds production-kernel traits one at a
    time to bisect which (if any) defeats Mosaic's DMA/compute overlap:

      smem - a (1,1) SMEM output accumulated across the sequential grid
             (the production Sum|u| partials, d2q9_pallas.py:187)
      halo - two extra 8-row input blocks with modular index maps into the
             same operand (the production K-halo blocks, d2q9_pallas.py:222)
      par  - declare the grid dimension "parallel" (no cross-iteration
             dependency) instead of the default "arbitrary"
    """
    nblk8 = ny // 8
    bb8 = band // 8

    def kernel(*refs):
        refs = list(refs)
        f_ref = refs.pop(0)
        prev_ref = refs.pop(0) if "halo" in features else None
        next_ref = refs.pop(0) if "halo" in features else None
        out_ref = refs.pop(0)
        tot_ref = refs.pop(0) if "smem" in features else None
        x = _work(f_ref[:], rounds)
        if prev_ref is not None:
            # touch the halo blocks so their DMAs are live (slice+concat:
            # Mosaic has no scatter-add lowering for .at[].add())
            x = jnp.concatenate(
                [x[:, 0:1, :] + prev_ref[:, 7:8, :],
                 x[:, 1:-1, :],
                 x[:, -1:, :] + next_ref[:, 0:1, :]], axis=1)
        out_ref[:] = x
        if tot_ref is not None:
            @pl.when(pl.program_id(0) == 0)
            def _():
                tot_ref[0, 0] = jnp.zeros((), jnp.float32)
            tot_ref[0, 0] += jnp.sum(f_ref[0, :1, :128])

    in_specs = [pl.BlockSpec((9, band, nx), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)]
    if "halo" in features:
        in_specs += [
            pl.BlockSpec((9, 8, nx), lambda i: (0, (i * bb8 - 1) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 8, nx), lambda i: (0, (i * bb8 + bb8) % nblk8, 0),
                         memory_space=pltpu.VMEM),
        ]
    out_specs = [pl.BlockSpec((9, band, nx), lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((9, ny, nx), jnp.float32)]
    if "smem" in features:
        out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))

    call = pl.pallas_call(
        kernel,
        grid=(ny // band,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT,
            dimension_semantics=(("parallel",) if "par" in features
                                 else ("arbitrary",)),
        ),
        interpret=interpret,
    )
    n_in = len(in_specs)
    multi_out = len(out_shape) > 1
    if n_in > 1 or multi_out:
        def wrapped(f, _call=call):
            out = _call(*([f] * n_in))
            return out[0] if multi_out else out
        return wrapped
    return call


@functools.lru_cache(maxsize=32)
def build_manual(ny: int, nx: int, band: int, rounds: int,
                 interpret: bool = False):
    """Manual double-buffered DMA pipeline (pallas guide pattern): start
    band i+1's copy-in before computing band i; output copies drain two
    iterations behind."""
    nb = ny // band
    if nb < 2:
        raise ValueError("manual pipeline needs >= 2 bands "
                         "(the epilogue waits on bands nb-2 and nb-1)")

    def kernel(f_hbm, out_hbm, in_sl, out_sl, in_sem, out_sem):
        def in_dma(slot, bi):
            return pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(bi * band, band), :],
                in_sl.at[slot], in_sem.at[slot])

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                out_sl.at[slot],
                out_hbm.at[:, pl.ds(bi * band, band), :],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def body(bi, _):
            slot = jax.lax.rem(bi, 2)
            nxt = jax.lax.rem(bi + 1, 2)

            @pl.when(bi + 1 < nb)
            def _():
                in_dma(nxt, bi + 1).start()

            in_dma(slot, bi).wait()
            res = _work(in_sl[slot], rounds)

            @pl.when(bi >= 2)
            def _():
                out_dma(slot, bi - 2).wait()

            out_sl[slot] = res
            out_dma(slot, bi).start()
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        out_dma((nb - 2) % 2, nb - 2).wait()
        out_dma((nb - 1) % 2, nb - 1).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 9, band, nx), jnp.float32),
            pltpu.VMEM((2, 9, band, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def build_manual_depth(ny: int, nx: int, band: int, rounds: int,
                       depth: int = 2, interpret: bool = False):
    """Depth-D ring-buffered variant of build_manual: keep up to D-1 input
    DMAs in flight (plus the drain of up to D output DMAs). Probes whether
    the ~320 GB/s band floor is an outstanding-transaction limit — a plain
    fused XLA pass over the same array measures ~512 GB/s combined, so the
    2-slot pipeline is NOT at the HBM ceiling."""
    nb = ny // band
    if nb < depth:
        raise ValueError("need >= depth bands")

    def kernel(f_hbm, out_hbm, in_sl, out_sl, in_sem, out_sem):
        def in_dma(slot, bi):
            return pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(bi * band, band), :],
                in_sl.at[slot], in_sem.at[slot])

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                out_sl.at[slot],
                out_hbm.at[:, pl.ds(bi * band, band), :],
                out_sem.at[slot])

        for j in range(depth - 1):  # prologue: D-1 fetches in flight
            in_dma(j, j).start()

        def body(bi, _):
            slot = jax.lax.rem(bi, depth)
            ahead = bi + depth - 1

            @pl.when(ahead < nb)
            def _():
                in_dma(jax.lax.rem(ahead, depth), ahead).start()

            in_dma(slot, bi).wait()
            res = _work(in_sl[slot], rounds)

            @pl.when(bi >= depth)
            def _():
                out_dma(slot, bi - depth).wait()

            out_sl[slot] = res
            out_dma(slot, bi).start()
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        for j in range(depth):  # epilogue: drain the last D writes
            bi = nb - depth + j
            out_dma(bi % depth, bi).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, 9, band, nx), jnp.float32),
            pltpu.VMEM((depth, 9, band, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def build_manual_flat(ny: int, nx: int, band: int, rounds: int,
                      interpret: bool = False, depth: int = 2):
    """Same bytes, contiguous descriptors: view the state as (9*ny, nx)
    and copy 9*band contiguous rows per DMA (one chunk) instead of the
    production band slice's 9 strided chunks. Distinguishes
    descriptor-chunking cost from a fundamental VMEM-staging cost.
    Elementwise work commutes with the reshape, so outputs stay
    bit-identical to the auto kernel."""
    rows = 9 * ny
    brows = 9 * band
    nb = ny // band
    if nb < depth:
        raise ValueError("need >= depth bands")

    def kernel(f_hbm, out_hbm, in_sl, out_sl, in_sem, out_sem):
        def in_dma(slot, bi):
            return pltpu.make_async_copy(
                f_hbm.at[pl.ds(bi * brows, brows), :],
                in_sl.at[slot], in_sem.at[slot])

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                out_sl.at[slot],
                out_hbm.at[pl.ds(bi * brows, brows), :],
                out_sem.at[slot])

        for j in range(depth - 1):
            in_dma(j, j).start()

        def body(bi, _):
            slot = jax.lax.rem(bi, depth)
            ahead = bi + depth - 1

            @pl.when(ahead < nb)
            def _():
                in_dma(jax.lax.rem(ahead, depth), ahead).start()

            in_dma(slot, bi).wait()
            res = _work(in_sl[slot], rounds)

            @pl.when(bi >= depth)
            def _():
                out_dma(slot, bi - depth).wait()

            out_sl[slot] = res
            out_dma(slot, bi).start()
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        for j in range(depth):
            bi = nb - depth + j
            out_dma(bi % depth, bi).wait()

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((rows, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((depth, brows, nx), jnp.float32),
            pltpu.VMEM((depth, brows, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )

    def wrapped(f):
        return call(f.reshape(rows, nx)).reshape(9, ny, nx)
    return wrapped


@functools.lru_cache(maxsize=32)
def build_auto_flat(ny: int, nx: int, band: int, rounds: int,
                    interpret: bool = False):
    """Automatic pipeline over the flat (9*ny, nx) view — contiguous
    (9*band, nx) blocks, one chunk per DMA."""
    rows, brows = 9 * ny, 9 * band

    def kernel(f_ref, out_ref):
        out_ref[:] = _work(f_ref[:], rounds)

    call = pl.pallas_call(
        kernel,
        grid=(ny // band,),
        in_specs=[pl.BlockSpec((brows, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((brows, nx), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, nx), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )

    def wrapped(f):
        return call(f.reshape(rows, nx)).reshape(9, ny, nx)
    return wrapped


@functools.lru_cache(maxsize=32)
def build_manual_alias(ny: int, nx: int, band: int, rounds: int,
                       interpret: bool = False):
    """build_manual with the output aliased onto the input buffer
    (input_output_aliases): reads and writes land on the same HBM pages,
    the way XLA's donated-carry fused loop does. Tests whether the
    two-stream (separate in/out arrays) pattern is what caps the Pallas
    path at ~320 GB/s while XLA's in-place loop measures ~625."""
    nb = ny // band
    if nb < 2:
        raise ValueError("manual pipeline needs >= 2 bands")

    def kernel(f_hbm, out_hbm, in_sl, out_sl, in_sem, out_sem):
        def in_dma(slot, bi):
            return pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(bi * band, band), :],
                in_sl.at[slot], in_sem.at[slot])

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                out_sl.at[slot],
                out_hbm.at[:, pl.ds(bi * band, band), :],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def body(bi, _):
            slot = jax.lax.rem(bi, 2)
            nxt = jax.lax.rem(bi + 1, 2)

            @pl.when(bi + 1 < nb)
            def _():
                in_dma(nxt, bi + 1).start()

            in_dma(slot, bi).wait()
            res = _work(in_sl[slot], rounds)

            @pl.when(bi >= 2)
            def _():
                out_dma(slot, bi - 2).wait()

            out_sl[slot] = res
            out_dma(slot, bi).start()
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        out_dma((nb - 2) % 2, nb - 2).wait()
        out_dma((nb - 1) % 2, nb - 1).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 9, band, nx), jnp.float32),
            pltpu.VMEM((2, 9, band, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def build_auto_alias(ny: int, nx: int, band: int, rounds: int,
                     interpret: bool = False):
    """Plain automatic-pipeline kernel with the output aliased onto the
    input buffer."""
    def kernel(f_ref, out_ref):
        out_ref[:] = _work(f_ref[:], rounds)

    return pl.pallas_call(
        kernel,
        grid=(ny // band,),
        in_specs=[pl.BlockSpec((9, band, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((9, band, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def build_manual_alias_safe(ny: int, nx: int, band: int, rounds: int,
                            interpret: bool = False):
    """In-place (aliased) manual pipeline with the write-after-read
    ordering an LBM stencil needs: band bi's in-place write starts only
    AFTER band bi+1's fetch has completed (band bi+1's top halo reads
    band bi's write region). Measures whether the delayed write-back
    costs any of the aliasing win."""
    nb = ny // band
    if nb < 3:
        raise ValueError("need >= 3 bands")

    def kernel(f_hbm, out_hbm, in_sl, out_sl, in_sem, out_sem):
        def in_dma(slot, bi):
            return pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(bi * band, band), :],
                in_sl.at[slot], in_sem.at[slot])

        def out_dma(slot, bi):
            return pltpu.make_async_copy(
                out_sl.at[slot],
                out_hbm.at[:, pl.ds(bi * band, band), :],
                out_sem.at[slot])

        in_dma(0, 0).start()

        def body(bi, _):
            slot = jax.lax.rem(bi, 2)
            nxt = jax.lax.rem(bi + 1, 2)

            @pl.when(bi + 1 < nb)
            def _():
                in_dma(nxt, bi + 1).start()

            # in(bi) done => every reader of band bi-1's write region has
            # its data => safe to flush band bi-1 in place
            in_dma(slot, bi).wait()

            @pl.when(bi >= 1)
            def _():
                out_dma(nxt, bi - 1).start()

            @pl.when(bi >= 2)
            def _():
                out_dma(slot, bi - 2).wait()

            res = _work(in_sl[slot], rounds)
            out_sl[slot] = res
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        out_dma((nb - 1) % 2, nb - 1).start()
        out_dma((nb - 2) % 2, nb - 2).wait()
        out_dma((nb - 1) % 2, nb - 1).wait()

    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((2, 9, band, nx), jnp.float32),
            pltpu.VMEM((2, 9, band, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )


def build_xla(ny: int, nx: int, band: int, rounds: int,
              interpret: bool = False):
    """Non-Pallas baseline: one fused XLA elementwise pass over the same
    (9, ny, nx) array — the compiler's own streaming loop, measuring what
    HBM read+write rate XLA achieves without any explicit staging. R=0
    still runs ONE fma round (a literal identity would fold away); the
    fma is issue-free relative to the bandwidth cost."""
    def call(f):
        return _work(f, max(rounds, 1))
    return call


def time_engine(build, ny, nx, band, rounds, iters, repeats=3):
    call = build(ny, nx, band, rounds)

    @jax.jit
    def run(f):
        return jax.lax.scan(lambda c, _: (call(c), 0), f, None,
                            length=iters)[0]

    f = jnp.full((9, ny, nx), 0.5, jnp.float32)
    np.asarray(run(f)[0, :1, :8])  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(run(f)[0, :1, :8])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def check_correct(ny, nx, band, interpret=False):
    """The manual pipeline must produce the same bytes as the auto one."""
    rounds = 2
    f = jnp.asarray(np.random.default_rng(0).random((9, ny, nx), np.float32))
    a = np.asarray(build_auto(ny, nx, band, rounds, interpret)(f))
    m = np.asarray(build_manual(ny, nx, band, rounds, interpret)(f))
    assert np.array_equal(a, m), float(np.abs(a - m).max())


def analyze(path):
    """Overlap fractions from a probe CSV: for each engine, copy = wall(0);
    compute(R) = wall_serial(R) - copy estimated from the wall(R) slope of
    the SERIAL hypothesis is unknowable, so report the direct bound:
    overlap_frac(R) = (copy + compute_R - wall_R) / min(copy, compute_R)
    with compute_R = wall_R_serialbase - copy taken from the AUTO engine
    (assumed fully serialized per d2q9-breakdown). 0 = serialized,
    1 = perfect overlap."""
    import csv
    from collections import defaultdict

    rows = defaultdict(dict)
    with open(path) as fh:
        for row in csv.DictReader(fh):
            rows[row["engine"]][int(row["rounds"])] = float(row["us_per_iter"])
    if "auto" not in rows or 0 not in rows.get("auto", {}):
        print("need auto R=0 rows as the serial baseline")
        return
    auto = rows["auto"]
    copy_us = auto[0]
    for eng, vals in sorted(rows.items()):
        for r in sorted(vals):
            if r == 0:
                print(f"{eng:10s} R={r:<3d} wall={vals[r]:8.1f}us "
                      f"(copy floor {vals[r] / copy_us:.2f}x auto)")
                continue
            compute = auto.get(r, float("nan")) - copy_us  # serial auto
            denom = min(copy_us, compute)
            frac = (copy_us + compute - vals[r]) / denom if denom > 0 else 0
            print(f"{eng:10s} R={r:<3d} wall={vals[r]:8.1f}us "
                  f"compute~{compute:7.1f}us overlap_frac={frac:+.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--analyze", metavar="CSV", default=None,
                    help="summarise an existing probe CSV and exit")
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--band", type=int, default=64)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--rounds", type=int, nargs="*", default=[0, 16, 32, 64])
    ap.add_argument("--engines", nargs="*",
                    default=["auto", "manual"],
                    choices=["auto", "auto_par", "auto_smem", "auto_halo",
                             "auto_full", "manual", "manual3", "manual4",
                             "manual6", "manual_flat", "auto_flat",
                             "manual_alias", "manual_alias_safe",
                             "auto_alias", "xla"])
    ap.add_argument("--device", default=None,
                    help="cpu|tpu (default: best available)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe.csv"))
    args = ap.parse_args()
    if args.analyze:
        analyze(args.analyze)
        return

    import sys
    sys.path.insert(0, REPO)
    from lbm_tpu.utils import profiling
    if args.device:
        profiling.select_platform(args.device)
    profiling.enable_compilation_cache(os.path.join(REPO, ".jax_cache"))
    platform = jax.devices()[0].platform

    ny = nx = args.size
    if any(e.startswith("manual") for e in args.engines):
        # small-scale canary BEFORE any full-size manual run: correctness
        # and (on hardware) that the explicit-DMA kernel terminates at all
        check_correct(256, 256, 64)
        print("correctness: manual == auto (bit-exact)")
    for eng in args.engines:
        if eng.startswith("manual") and eng[len("manual"):].isdigit():
            d = int(eng[len("manual"):])
            fr = jnp.asarray(
                np.random.default_rng(0).random((9, 256, 256), np.float32))
            a = np.asarray(build_auto(256, 256, 32, 2)(fr))
            m = np.asarray(build_manual_depth(256, 256, 32, 2, depth=d)(fr))
            assert np.array_equal(a, m), (eng, float(np.abs(a - m).max()))
            print(f"correctness: {eng} == auto (bit-exact)")
        elif eng == "manual_flat":
            fr = jnp.asarray(
                np.random.default_rng(0).random((9, 256, 256), np.float32))
            a = np.asarray(build_auto(256, 256, 32, 2)(fr))
            m = np.asarray(build_manual_flat(256, 256, 32, 2)(fr))
            assert np.array_equal(a, m), float(np.abs(a - m).max())
            print("correctness: manual_flat == auto (bit-exact)")

    engines = {
        "auto": build_auto,
        "auto_par": functools.partial(build_auto,
                                      features=frozenset({"par"})),
        "auto_smem": functools.partial(build_auto,
                                       features=frozenset({"smem"})),
        "auto_halo": functools.partial(build_auto,
                                       features=frozenset({"halo"})),
        "auto_full": functools.partial(build_auto,
                                       features=frozenset({"smem", "halo"})),
        "manual": build_manual,
        "manual_flat": build_manual_flat,
        "manual_alias": build_manual_alias,
        "manual_alias_safe": build_manual_alias_safe,
        "auto_alias": build_auto_alias,
        "auto_flat": build_auto_flat,
        "manual3": functools.partial(build_manual_depth, depth=3),
        "manual4": functools.partial(build_manual_depth, depth=4),
        "manual6": functools.partial(build_manual_depth, depth=6),
        "xla": build_xla,
    }
    exists = os.path.exists(args.out)
    with open(args.out, "a") as fh:
        if not exists:
            fh.write("engine,platform,grid,band,rounds,iters,"
                     "us_per_iter,rw_gbps\n")
        for eng in args.engines:
            build = engines[eng]
            for r in args.rounds:
                dt = time_engine(build, ny, nx, args.band, r, args.iters)
                gbps = 2 * 9 * ny * nx * 4 / dt / 1e9
                row = (eng, platform, f"{ny}x{nx}", args.band, r,
                       args.iters, round(dt * 1e6, 1), round(gbps, 1))
                print(json.dumps({"engine": eng, "rounds": r,
                                  "us_per_iter": round(dt * 1e6, 1),
                                  "rw_gbps": round(gbps, 1)}))
                # append immediately: a crash mid-sweep must not lose rows
                fh.write(",".join(str(x) for x in row) + "\n")
                fh.flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
