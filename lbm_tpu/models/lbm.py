"""End-to-end D2Q9 lattice-Boltzmann simulation driver.

The TPU-native equivalent of the reference's application drivers
(main/LbmAoS.cpp, main/LbmCpu.cpp, main/LastChance.cpp): load params and
obstacles, initialise, run the fully-device-resident timestep loop, write
av_vels.dat / final_state.dat and print the `==done==` summary block
(reference: main/LastChance.cpp:279-284, main/LbmAoS.cpp:441-450).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..core import io, state
from ..core.params import Obstacles, Params, reynolds_number
from ..ops import d2q9


@dataclasses.dataclass
class LbmResult:
    f_final: np.ndarray
    av_vels: np.ndarray
    compute_seconds: float
    reynolds: float
    total_density: float
    # steps actually executed in the timed window (differs from
    # av_vels.size on a checkpoint resume); None = all of av_vels
    steps_run: int | None = None


def run_simulation(
    params: Params,
    obstacles: Obstacles,
    *,
    dtype=jnp.float32,
    engine: str = "jax",
    num_steps: int | None = None,
) -> LbmResult:
    """Run the full simulation. `engine` selects the compute path:
    'jax' (pure-JAX fused step), 'pallas' (hand-fused TPU kernel),
    'pallas-manual' (same kernel with an explicitly double-buffered DMA
    pipeline, ops/d2q9_pallas_manual.py), 'pallas-inplace' (the manual
    pipeline writing back into the input lattice — one HBM stream instead
    of two, the measured-best engine, ops/d2q9_pallas_inplace.py) or
    'native' (serial C++ host
    engine, native/d2q9_serial.cpp — the reference's lbm_cpu/compareLbm
    analogue; no JAX, no compile). Keeping two pallas generations mirrors
    the reference's codelet-generation family (D2Q9Codelets vs
    D2Q9CodeletsOld). 'auto' resolves to the measured-best single-chip
    pallas generation for this grid (d2q9_pallas.choose_engine)."""
    p = params if num_steps is None else dataclasses.replace(params, max_iters=num_steps)

    if engine == "auto":
        from ..ops import d2q9_pallas

        engine = d2q9_pallas.choose_engine(p.ny, p.nx)

    if engine == "native":
        from ..ops import d2q9_native

        f_host = state.initial_distributions(p, np.dtype(dtype))
        t0 = time.perf_counter()
        f_np, av_np = d2q9_native.simulate(p, f_host, obstacles.mask)
        compute_seconds = time.perf_counter() - t0
        return LbmResult(
            f_final=f_np,
            av_vels=av_np,
            compute_seconds=compute_seconds,
            reynolds=reynolds_number(p, float(av_np[-1])),
            total_density=state.total_density(f_np),
        )

    f0 = jnp.asarray(state.initial_distributions(p, np.dtype(dtype)))
    mask = jnp.asarray(obstacles.mask)

    if engine == "jax":
        simulate = d2q9.simulate
    elif engine == "pallas":
        from ..ops import d2q9_pallas

        simulate = d2q9_pallas.simulate
    elif engine == "pallas-manual":
        from ..ops import d2q9_pallas_manual

        simulate = d2q9_pallas_manual.simulate
    elif engine == "pallas-inplace":
        from ..ops import d2q9_pallas_inplace

        simulate = d2q9_pallas_inplace.simulate
    else:
        raise ValueError(f"unknown engine {engine!r}")

    # warm-up compile (excluded from the timed run, like the reference's
    # separate graph-construction timing, main/LbmAoS.cpp:306-390).
    # NB: materialize via np.asarray — block_until_ready does not flush on
    # remote-tunnel platforms (see CLAUDE.md).
    f_final, av_vels = simulate(p, f0, mask)
    np.asarray(av_vels)

    t0 = time.perf_counter()
    f_final, av_vels = simulate(p, f0, mask)
    av_np = np.asarray(av_vels, dtype=np.float64)
    compute_seconds = time.perf_counter() - t0

    f_np = np.asarray(f_final)
    re = reynolds_number(p, float(av_np[-1]))
    return LbmResult(
        f_final=f_np,
        av_vels=av_np,
        compute_seconds=compute_seconds,
        reynolds=re,
        total_density=state.total_density(f_np),
    )


def run_simulation_with_checkpoints(
    params: Params,
    obstacles: Obstacles,
    *,
    checkpoint_path: str | Path,
    checkpoint_every: int,
    dtype=jnp.float32,
    engine: str = "jax",
    resume: bool = False,
    num_steps: int | None = None,
    k_steps: int | None = None,
    strategy: str = "ppermute",
    num_devices: int | None = None,
) -> LbmResult:
    """Run in chunks of `checkpoint_every` steps, writing an atomic .npz
    checkpoint after each chunk; `resume=True` continues from an existing
    checkpoint. Chunking is bit-identical to one uninterrupted run of the
    same engine config (same jitted step, same order). For the pallas
    engine both the total and checkpoint_every must be multiples of
    k_steps — kernels compiled at different K differ at the ulp level
    (different Mosaic instruction selection), so a remainder chunk at
    another K would break exactness. k_steps=None prefers the grid's
    measured choose_config K (8 on non-resident grids), falling back to
    the deepest of 4/2/1 dividing both (mirroring d2q9_pallas.simulate's
    K fallback, so any step count the plain CLI accepts also checkpoints).
    Multi-chip engines ('sharded' with a halo `strategy`, 'sharded-pallas')
    checkpoint the gathered global state, so a checkpoint written on one
    mesh can resume on another (valid cells are mesh-independent).
    Beyond-reference capability — see core/checkpoint.py."""
    from ..core import checkpoint
    from ..ops import d2q9

    p = params if num_steps is None else dataclasses.replace(params, max_iters=num_steps)
    if engine == "auto":
        from ..ops import d2q9_pallas

        engine = d2q9_pallas.choose_engine(p.ny, p.nx)
    total = p.max_iters
    pallas_like = engine in ("pallas", "pallas-manual", "pallas-inplace",
                             "sharded-pallas")
    auto_k = k_steps is None

    aw = d2q9.AccelWeights.from_params(p)
    accel_row = p.ny - 2
    num_free = float((~obstacles.mask).sum())

    ck_path = Path(checkpoint_path)
    ck = None
    if resume and ck_path.exists():
        ck = checkpoint.load(ck_path, expect=p)

    # K selection AFTER loading any checkpoint: checkpoints record the K
    # they were written with, and resuming at a different K would break
    # bit-exactness silently (kernels compiled at different K differ at
    # the ulp level) even when the start step happens to align.
    if pallas_like and auto_k:
        if ck is not None and (ck.k_steps or 0) > 0:
            k_steps = ck.k_steps  # continue exactly as written
        elif ck is not None:
            # legacy checkpoint without a recorded K: reproduce the
            # pre-choose_config default chain it was written under
            k_steps = next(k for k in (4, 2, 1)
                           if total % k == 0 and checkpoint_every % k == 0)
        else:
            # fresh run: prefer the measured (band, K) optimum for the
            # grid (K=8 beyond the VMEM-resident sizes), falling back to
            # the deepest dividing K
            if engine == "pallas-inplace":
                from ..ops import d2q9_pallas_inplace

                preferred = d2q9_pallas_inplace.choose_config(p.ny, p.nx)[1]
            elif engine in ("pallas", "pallas-manual"):
                from ..ops import d2q9_pallas

                preferred = d2q9_pallas.choose_config(p.ny, p.nx)[1]
            else:
                preferred = 4
            k_steps = next(k for k in (preferred, 4, 2, 1)
                           if total % k == 0 and checkpoint_every % k == 0)
    elif k_steps is None:
        k_steps = 4  # unused by non-pallas engines
    if (pallas_like and ck is not None and (ck.k_steps or 0) > 0
            and k_steps != ck.k_steps):
        raise ValueError(
            f"checkpoint was written at k_steps={ck.k_steps} but this run "
            f"uses k_steps={k_steps}; kernels compiled at different K "
            "differ at the ulp level — pass the writer's k_steps (or "
            "k_steps=None to adopt it)"
        )
    if pallas_like and (total % k_steps or checkpoint_every % k_steps):
        raise ValueError(
            f"pallas checkpointing needs num_steps ({total}) and "
            f"checkpoint_every ({checkpoint_every}) divisible by "
            f"k_steps ({k_steps}) for bit-exact chunking"
        )

    if ck is not None:
        f_host = np.asarray(ck.f, np.dtype(dtype))
        start = ck.step
        if start > total:
            raise ValueError(
                f"checkpoint is at step {start}, beyond the requested "
                f"{total} steps — nothing to resume"
            )
        if pallas_like and start % k_steps:
            raise ValueError(
                f"checkpoint step {start} is not a multiple of k_steps "
                f"({k_steps}); it was written by a differently-chunked run "
                "— resume with the engine that wrote it"
            )
        av_parts = [np.asarray(ck.av_vels, np.float64)]
    else:
        f_host = state.initial_distributions(p, np.dtype(dtype))
        start = 0
        av_parts = []
    need_first_accel = start == 0

    if engine == "native":
        from ..ops import d2q9_native

        f = np.ascontiguousarray(f_host)
        if need_first_accel:
            d2q9_native.first_accelerate(
                f, obstacles.mask, accel_row=accel_row,
                accel_w1=aw.w1, accel_w2=aw.w2)

        def run_chunk(f, n):
            tot = d2q9_native.run(
                f, obstacles.mask, num_steps=n, omega=p.omega,
                accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row)
            return f, tot

        def gather(f):
            return f

    elif engine in ("jax", "pallas", "pallas-manual", "pallas-inplace"):
        mask = jnp.asarray(obstacles.mask)
        f = jnp.asarray(f_host)
        if need_first_accel:
            f = d2q9.first_accelerate(f, mask, accel_row=accel_row,
                                      accel_w1=aw.w1, accel_w2=aw.w2)
        amask = d2q9.accel_row_mask(p.ny, p.nx, accel_row, dtype=f.dtype)
        mask_f = mask.astype(f.dtype)

        def run_chunk(f, n):
            if engine == "jax":
                return d2q9.run(f, mask, amask, num_steps=n, omega=p.omega,
                                accel_w1=aw.w1, accel_w2=aw.w2)
            if engine == "pallas-manual":
                from ..ops import d2q9_pallas_manual

                return d2q9_pallas_manual.run(
                    f, mask_f, num_steps=n, omega=p.omega,
                    accel_w1=aw.w1, accel_w2=aw.w2,
                    accel_row=accel_row, k_steps=k_steps)
            if engine == "pallas-inplace":
                from ..ops import d2q9_pallas_inplace

                return d2q9_pallas_inplace.run(
                    f, mask_f, num_steps=n, omega=p.omega,
                    accel_w1=aw.w1, accel_w2=aw.w2,
                    accel_row=accel_row, k_steps=k_steps)
            from ..ops import d2q9_pallas

            return d2q9_pallas.run(f, mask_f, num_steps=n, omega=p.omega,
                                   accel_w1=aw.w1, accel_w2=aw.w2,
                                   accel_row=accel_row, k_steps=k_steps)

        def gather(f):
            return np.asarray(f)

    elif engine == "sharded":
        import jax

        from ..parallel import halo, mesh as mesh_lib

        if strategy == "none":
            raise ValueError("'none' skips halo exchange — wrong physics")
        n_dev = num_devices or len(jax.devices())
        mesh = mesh_lib.make_mesh(n_dev, p.ny, p.nx)
        f, padded_mask, amask, (pad_r, pad_c) = halo.prepare_sharded(
            p, f_host, obstacles.mask, mesh, strategy,
            first_accelerate=need_first_accel,
        )

        def run_chunk(f, n):
            if strategy == "implicit":
                return d2q9.run(f, padded_mask, amask, num_steps=n,
                                omega=p.omega, accel_w1=aw.w1, accel_w2=aw.w2)
            return halo.run_sharded(
                f, padded_mask, amask, mesh=mesh, num_steps=n,
                omega=p.omega, accel_w1=aw.w1, accel_w2=aw.w2,
                exchange=strategy, pad_rows=pad_r, pad_cols=pad_c)

        def gather(f):
            return np.asarray(f)[:, : p.ny, : p.nx]

    elif engine == "sharded-pallas":
        if strategy not in (None, "ppermute"):
            raise ValueError(
                f"--strategy {strategy!r} applies to --engine sharded only; "
                "sharded-pallas always uses the ghost-band ppermute exchange"
            )
        from ..parallel import pallas_sharded

        mesh = pallas_sharded.make_row_mesh(num_devices)
        f, mask_ext_f, _pad = pallas_sharded.prepare(
            p, f_host, obstacles.mask, mesh,
            first_accelerate=need_first_accel,
        )

        def run_chunk(f, n):
            return pallas_sharded.run(
                f, mask_ext_f, mesh=mesh, num_steps=n, k_steps=k_steps,
                omega=p.omega, accel_w1=aw.w1, accel_w2=aw.w2,
                accel_row=accel_row, ny=p.ny)

        def gather(f):
            return np.asarray(f)[:, : p.ny, :]

    else:
        raise ValueError(f"unknown engine {engine!r}")

    steps_run = total - start
    t0 = time.perf_counter()
    while start < total:
        n = min(checkpoint_every, total - start)
        f, tot = run_chunk(f, n)
        # divide in f.dtype to match each engine's simulate() exactly
        # (numpy for the native engine — jnp would truncate f64 state to
        # f32 when x64 is off)
        if isinstance(f, np.ndarray):
            av_parts.append(
                (tot.astype(f.dtype) / f.dtype.type(num_free)).astype(np.float64))
        else:
            av_parts.append(np.asarray(
                tot / jnp.asarray(num_free, f.dtype), np.float64))
        start += n
        checkpoint.save(ck_path, gather(f), np.concatenate(av_parts),
                        start, p, k_steps=k_steps if pallas_like else None)
    compute_seconds = time.perf_counter() - t0

    av_np = np.concatenate(av_parts) if av_parts else np.zeros(0)
    f_np = gather(f)
    return LbmResult(
        f_final=f_np,
        av_vels=av_np,
        compute_seconds=compute_seconds,
        reynolds=reynolds_number(p, float(av_np[-1])),
        total_density=state.total_density(f_np),
        steps_run=steps_run,
    )


def run_simulation_sharded(
    params: Params,
    obstacles: Obstacles,
    *,
    dtype=jnp.float32,
    strategy: str = "ppermute",
    engine: str = "sharded",
    num_devices: int | None = None,
    num_steps: int | None = None,
    overlap: bool = False,
) -> LbmResult:
    """Multi-device simulation over a jax.sharding.Mesh.

    engine='sharded' uses the pure-JAX distributed step with the chosen halo
    `strategy`; engine='sharded-pallas' uses the communication-avoiding
    ghost-band + local K-step Pallas path (parallel/pallas_sharded.py);
    overlap=True (sharded-pallas only) rides the row-ghost ppermutes under
    the interior kernel (pallas_sharded.make_overlap_chunk_fn).
    """
    import jax

    from ..parallel import halo, mesh as mesh_lib, pallas_sharded

    p = params if num_steps is None else dataclasses.replace(params, max_iters=num_steps)
    n = num_devices or len(jax.devices())
    f0 = state.initial_distributions(p, np.dtype(dtype))

    if engine == "sharded-pallas":
        if strategy not in (None, "ppermute"):
            raise ValueError(
                f"--strategy {strategy!r} applies to --engine sharded only; "
                "sharded-pallas always uses the ghost-band ppermute exchange"
            )
        mesh = pallas_sharded.make_row_mesh(n)
        sim = lambda: pallas_sharded.simulate(p, f0, obstacles.mask, mesh,
                                              overlap=overlap)
    else:
        if overlap:
            raise ValueError(
                "overlap=True applies to engine='sharded-pallas' only")
        mesh = mesh_lib.make_mesh(n, p.ny, p.nx)
        sim = lambda: halo.simulate_sharded(p, f0, obstacles.mask, mesh,
                                            strategy=strategy)

    f_final, av = sim()
    np.asarray(av)  # materialize = compile + warm (see CLAUDE.md timing note)
    t0 = time.perf_counter()
    f_final, av = sim()
    av_np = np.asarray(av, dtype=np.float64)
    compute_seconds = time.perf_counter() - t0

    f_np = np.asarray(f_final)
    return LbmResult(
        f_final=f_np,
        av_vels=av_np,
        compute_seconds=compute_seconds,
        reynolds=reynolds_number(p, float(av_np[-1])),
        total_density=state.total_density(f_np),
    )


def write_outputs(
    result: LbmResult,
    params: Params,
    obstacles: Obstacles,
    out_dir: str | Path = ".",
) -> tuple[Path, Path]:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    av_path = out_dir / "av_vels.dat"
    fs_path = out_dir / "final_state.dat"
    io.write_av_vels(av_path, result.av_vels)
    io.write_final_state(fs_path, params, obstacles.mask, result.f_final)
    return av_path, fs_path


def print_summary(result: LbmResult) -> None:
    print("==done==")
    print(f"Reynolds number:\t\t{result.reynolds:.12E}")
    print(f"Total compute time:\t\t{result.compute_seconds:.6f} (s)")
    print(f"Total density:\t\t\t{result.total_density:.6E}")
    steps = (result.steps_run if result.steps_run is not None
             else result.av_vels.size)
    if steps:
        mlups = (
            steps
            * result.f_final.shape[-1]
            * result.f_final.shape[-2]
            / result.compute_seconds
            / 1e6
        )
        print(f"MLUPS:\t\t\t\t{mlups:.1f}")
    else:
        print("MLUPS:\t\t\t\t- (nothing to run: checkpoint already complete)")
