"""3x3 Gaussian-blur stencil: XLA conv engine + fused Pallas kernel.

Reference capability: the Gaussian-blur suite (main/GaussianBlurCpu.cpp:12-34
serial kernel; main/GaussianBlurPoplibs.cpp 3x3 poplin::convolution;
main/GaussianBlurLowLevel.cpp hand-built vertices with float/float2/half/half4
dtype dispatch). Kernel = (1 2 1; 2 4 2; 1 2 1)/16 per channel; the image
carries a zero ghost ring that is never written, so the boundary condition is
"zero outside".

TPU recast:
  * engine='conv'   — depthwise `lax.conv_general_dilated`; XLA lowers a 3x3
    depthwise conv to fused VPU shifts (the poplin::convolution analogue).
  * engine='pallas' — one fused pass: row-band grid, halo rows via modular
    index_map, column shifts in VMEM, masked write keeping the pad ring zero.
  * dtype float32 / bfloat16 — the float / half vectorisation axis of the
    reference's study (experiments/gaussian-blur-scaling).

State layout: (C, Hp, Wp) channels-first, zero-padded and TPU-aligned via
utils.image.pad_to_tile, with an interior {0,1} mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (1 2 1; 2 4 2; 1 2 1)/16
KERNEL = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]) / 16.0


def blur_step_conv(img: jax.Array, interior: jax.Array) -> jax.Array:
    """One blur via depthwise conv. img: (C, H, W); interior: (H, W) {0,1}."""
    c = img.shape[0]
    k = jnp.asarray(KERNEL, img.dtype)
    kern = jnp.broadcast_to(k, (c, 1, 3, 3))  # OIHW depthwise
    out = jax.lax.conv_general_dilated(
        img[None],  # NCHW
        kern,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        # f32 convs otherwise route through the MXU's bf16 multiply path on
        # TPU (~3e-3 error measured at 8 passes) — this engine is the
        # compatibility/oracle path, so f32 in must mean f32 arithmetic;
        # bf16 storage keeps the fast default, matching the reference's
        # half engines (GaussianBlurLowLevel.cpp dtype dispatch)
        precision=(jax.lax.Precision.HIGHEST
                   if img.dtype == jnp.float32 else None),
        preferred_element_type=img.dtype,
    )[0]
    return out * interior


def _shift_rows(ext, band, dr):
    # ext: (C, band+2, W); rows shifted by dr in {-1,0,1}
    return ext[:, 1 + dr : 1 + dr + band, :]


def _blur_kernel(img_ref, prev_ref, next_ref, interior_ref, out_ref, *, band: int):
    # compute in f32: TPU vector rotates only support 32-bit lanes, and the
    # accumulation is more accurate — bf16 is a storage format here, exactly
    # like the reference's half codelets computing via float intermediates
    cur = img_ref[:].astype(jnp.float32)
    above = prev_ref[:, 7, :].astype(jnp.float32)
    below = next_ref[:, 0, :].astype(jnp.float32)
    ext = jnp.concatenate([above[:, None, :], cur, below[:, None, :]], axis=1)

    n = _shift_rows(ext, band, -1)
    m = cur
    s = _shift_rows(ext, band, 1)

    w = ext.shape[-1]

    def left(x):
        return pltpu.roll(x, 1, axis=x.ndim - 1)

    def right(x):
        return pltpu.roll(x, w - 1, axis=x.ndim - 1)

    acc = 4.0 * m
    acc = acc + 2.0 * (n + s + left(m) + right(m))
    acc = acc + (left(n) + right(n) + left(s) + right(s))
    blurred = acc * (1.0 / 16.0) * interior_ref[:].astype(jnp.float32)[None]
    out_ref[:] = blurred.astype(out_ref.dtype)


@functools.lru_cache(maxsize=32)
def _build_pallas_blur(c, h, w, dtype_name, band, interpret):
    dtype = jnp.dtype(dtype_name)
    if h % band or band % 8 or h % 8:
        raise ValueError(f"bad band {band} for height {h}")
    grid = h // band
    nblk8 = h // 8
    bb8 = band // 8
    return pl.pallas_call(
        functools.partial(_blur_kernel, band=band),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, band, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 8, w), lambda i: (0, (i * bb8 - 1) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 8, w), lambda i: (0, (i * bb8 + bb8) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, band, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def blur_step_pallas(img: jax.Array, interior: jax.Array, *,
                     band: int | None = None,
                     interpret: bool | None = None) -> jax.Array:
    """One fused blur pass. The modular row wraparound only ever reads the
    zero pad ring (>=1 zero row at each edge, masked output), so it is exact
    for the zero-boundary stencil."""
    c, h, w = img.shape
    if band is None:
        band = _choose_band(h, w, c, img.dtype.itemsize)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _build_pallas_blur(c, h, w, jnp.dtype(img.dtype).name, band,
                              bool(interpret))
    return call(img, img, img, interior)


def _choose_band(h: int, w: int = 512, c: int = 4, itemsize: int = 4) -> int:
    """Largest band (multiple of 8 dividing h, <=256) whose input window
    c*band*w*itemsize stays under ~2 MB — wider bands blow the scoped-VMEM
    budget on wide images (Mosaic temporaries scale with the block; a
    4096-wide f32 image OOMs at band 256 but runs at 32-64)."""
    budget = 2 * 1024 * 1024
    best = 0
    for b in range(8, 257, 8):
        if h % b == 0 and (b == 8 or c * b * w * itemsize <= budget):
            best = b
    if not best:
        raise ValueError(f"height {h} not a multiple of 8")
    return best


MAX_PASSES_PER_SWEEP = 8  # halo blocks are 8 rows -> k <= 8


def _blur_kernel_k(img_ref, prev_ref, next_ref, int_ref, iprev_ref,
                   inext_ref, out_ref, *, band: int, k: int):
    """K blur passes on one row band per HBM sweep — temporal blocking, the
    blur analogue of the LBM K-step kernel (d2q9_pallas._kernel): a sweep
    reads band+16 rows and writes band rows, so HBM traffic per pass falls
    as 1/K. Intermediate images live only in VMEM; the interior mask is
    applied at every intermediate pass over every computed row, so the zero
    pad ring keeps isolating the image from periodic wraparound exactly as
    in the single-pass kernel. Adjacent bands recompute their 2(K-j) overlap
    rows identically, so the result is band-decomposition-independent."""
    # x: rows i*B-K .. i*B+B+K-1 (band + 2K rows), f32 compute
    x = jnp.concatenate(
        [prev_ref[:, 8 - k:, :], img_ref[:], next_ref[:, :k, :]], axis=1
    ).astype(jnp.float32)
    # interior mask over the widest computed region: band + 2(K-1) rows
    if k > 1:
        m_wide = jnp.concatenate(
            [iprev_ref[8 - (k - 1):, :], int_ref[:], inext_ref[: k - 1, :]],
            axis=0,
        ).astype(jnp.float32)
    else:
        m_wide = int_ref[:].astype(jnp.float32)

    w = img_ref.shape[-1]

    def shift(r, d):  # periodic column shift: out[i] = r[i-d], either sign
        return jnp.concatenate([r[:, :, -d:], r[:, :, :-d]], axis=2)

    for j in range(1, k + 1):
        n_rows = band + 2 * (k - j)
        rows = x[:, :n_rows, :] + 2.0 * x[:, 1:n_rows + 1, :] + x[:, 2:n_rows + 2, :]
        acc = shift(rows, -1) + 2.0 * rows + shift(rows, 1)
        lo = j - 1  # offset of this pass's region within m_wide
        # slice first, expand_dims after: a combined m_wide[None, lo:...]
        # lowers to a gather, which Mosaic cannot lower in this layout
        x = acc * (1.0 / 16.0) * jnp.expand_dims(m_wide[lo:lo + n_rows, :], 0)
    out_ref[:] = x.astype(out_ref.dtype)


@functools.lru_cache(maxsize=32)
def _build_pallas_blur_k(c, h, w, dtype_name, band, k, interpret):
    dtype = jnp.dtype(dtype_name)
    if h % band or band % 8 or h % 8:
        raise ValueError(f"bad band {band} for height {h}")
    if not 1 <= k <= MAX_PASSES_PER_SWEEP:
        raise ValueError(f"k_passes must be in 1..{MAX_PASSES_PER_SWEEP}")
    if k > 1 and h < 16:
        raise ValueError("k_passes > 1 needs at least two 8-row blocks")
    grid = h // band
    nblk8 = h // 8
    bb8 = band // 8
    return pl.pallas_call(
        functools.partial(_blur_kernel_k, band=band, k=k),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((c, band, w), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 8, w), lambda i: (0, (i * bb8 - 1) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 8, w), lambda i: (0, (i * bb8 + bb8) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w), lambda i: ((i * bb8 - 1) % nblk8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, w), lambda i: ((i * bb8 + bb8) % nblk8, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, band, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def blur_k_pallas(img: jax.Array, interior: jax.Array, *, k_passes: int,
                  band: int | None = None,
                  interpret: bool | None = None) -> jax.Array:
    """`k_passes` fused blur passes in ONE pass over HBM (k_passes <= 8).
    For images too large for the resident engine: per-pass HBM traffic
    falls as 1/K. Mathematically identical to k_passes calls of
    blur_step_pallas (differs at f32 rounding: this kernel accumulates the
    separable rows-then-columns order, the single-pass kernel the direct
    9-point sum)."""
    c, h, w = img.shape
    if band is None:
        band = _choose_band(h, w, c, img.dtype.itemsize)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _build_pallas_blur_k(c, h, w, jnp.dtype(img.dtype).name, band,
                                int(k_passes), bool(interpret))
    return call(img, img, img, interior, interior, interior)


def _resident_kernel(n_ref, img_ref, interior_ref, out_ref, buf):
    """The whole image lives in VMEM for the entire run — one HBM read, one
    HBM write, `n_ref[0]` stencil applications in between. The TPU analogue
    of the IPU holding the image in tile SRAM across the Repeat program
    (main/GaussianBlurLowLevel.cpp:211-216): per-pass cost is pure VPU work,
    no HBM traffic and no kernel-launch latency. The pass count is a runtime
    SMEM scalar, so one Mosaic compile serves every run length."""
    interior = interior_ref[:].astype(jnp.float32)[None]
    buf[0] = img_ref[:].astype(jnp.float32)

    def shift(x, d, axis):
        # periodic shift via static slice+concat: measured ~8% faster than
        # pltpu.roll in this kernel (experiments/blur-resident-opt), and
        # bit-identical. shift(x, -1, a)[i] = x[i+1]; shift(x, 1, a)[i] = x[i-1].
        pre = [slice(None)] * axis
        lead = tuple(pre + [slice(-d, None) if d < 0 else slice(None, -d)])
        tail = tuple(pre + [slice(None, -d) if d < 0 else slice(-d, None)])
        a, b = x[lead], x[tail]
        return jnp.concatenate([a, b] if d < 0 else [b, a], axis=axis)

    def blur(x):
        # separable: (1 2 1)^T (1 2 1) / 16 — 4 shifts instead of 10
        rows = shift(x, -1, 1) + 2.0 * x + shift(x, 1, 1)
        acc = shift(rows, -1, 2) + 2.0 * rows + shift(rows, 1, 2)
        return acc * (1.0 / 16.0) * interior

    def body(i, _):  # two passes per iteration: static ping-pong, no
        buf[1] = blur(buf[0])  # dynamic scratch indexing
        buf[0] = blur(buf[1])
        return 0

    jax.lax.fori_loop(0, n_ref[0] // 2, body, 0)
    out_ref[:] = buf[0].astype(out_ref.dtype)


@functools.lru_cache(maxsize=32)
def _build_resident_blur(c, h, w, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    return pl.pallas_call(
        _resident_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), dtype),
        scratch_shapes=[pltpu.VMEM((2, c, h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


RESIDENT_VMEM_BUDGET = 100 * 1024 * 1024


def resident_fits(img: jax.Array) -> bool:
    """Whether the resident engine's VMEM estimate fits the budget."""
    c, h, w = img.shape
    needed = (2 * 4 + img.dtype.itemsize * 2 + 2 * 4) * c * h * w
    return needed <= RESIDENT_VMEM_BUDGET


def blur_resident(img: jax.Array, interior: jax.Array, *, num_passes: int,
                  interpret: bool | None = None) -> jax.Array:
    """`num_passes` blur applications with the image VMEM-resident
    throughout. Needs ~11 * C*H*W bytes of VMEM — use the banded engines
    for images beyond roughly 1600x1600."""
    c, h, w = img.shape
    if not resident_fits(img):
        needed = (2 * 4 + img.dtype.itemsize * 2 + 2 * 4) * c * h * w
        raise ValueError(
            f"image {c}x{h}x{w} needs ~{needed >> 20}MB VMEM for the "
            f"resident engine (budget {RESIDENT_VMEM_BUDGET >> 20}MB); "
            "use engine='pallas' (ideally with k_passes) or 'conv' for "
            "images this large"
        )
    if num_passes % 2:
        raise ValueError("resident blur runs passes in pairs (even num_passes)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    call = _build_resident_blur(c, h, w, jnp.dtype(img.dtype).name,
                                bool(interpret))
    return call(jnp.asarray([num_passes], jnp.int32), img, interior)


@functools.partial(jax.jit,
                   static_argnames=("num_iters", "engine", "band", "k_passes"))
def blur_many(img: jax.Array, interior: jax.Array, *, num_iters: int,
              engine: str = "conv", band: int | None = None,
              k_passes: int | None = None) -> jax.Array:
    """num_iters x2 blur passes (the reference runs pairs:
    GaussianBlurCpu.cpp:77-81, GaussianBlurLowLevel.cpp:211-216).
    engine='resident' executes the whole run inside one VMEM-resident kernel;
    'conv'/'pallas' scan over per-pass kernels. k_passes (pallas engine only)
    fuses that many passes per HBM sweep — temporal blocking for images too
    large for the resident engine; must divide 2*num_iters."""
    if engine == "resident":
        return blur_resident(img, interior, num_passes=2 * num_iters)
    if engine == "pallas" and k_passes is not None and k_passes > 1:
        if (2 * num_iters) % k_passes:
            raise ValueError(
                f"k_passes {k_passes} must divide 2*num_iters {2 * num_iters}")

        def body_k(carry, _):
            return blur_k_pallas(carry, interior, k_passes=k_passes,
                                 band=band), None

        out, _ = jax.lax.scan(body_k, img, None,
                              length=2 * num_iters // k_passes)
        return out

    step = {
        "conv": blur_step_conv,
        "pallas": functools.partial(blur_step_pallas, band=band),
    }[engine]

    def body(carry, _):
        return step(step(carry, interior), interior), None

    out, _ = jax.lax.scan(body, img, None, length=num_iters)
    return out
