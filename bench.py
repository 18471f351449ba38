#!/usr/bin/env python3
"""Headline benchmark: D2Q9 MLUPS at 1024x1024 on one TPU chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "MLUPS", "vs_baseline": N/2000}

Baseline is the rebuild north-star from BASELINE.json: >=2000 MLUPS/chip at
1024x1024 with av_vels tracking the reference golden data. The benchmark
gates on correctness (100-step av_vels prefix vs check/ golden), then times
the engines:
  * jax        — pure-XLA fused step (fast compile, ~5300 MLUPS)
  * pallas_k4  — K=4 temporal-blocking Pallas kernel (~9400 MLUPS), whose
                 Mosaic compile can take minutes cold, so it runs in a
                 timeout-guarded subprocess backed by a persistent
                 compilation cache (.jax_cache/).

NB: on the remote-tunnel TPU platform block_until_ready does not flush
execution; fetching results (np.asarray) is the only honest barrier.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NUM_STEPS = 2000
BASELINE_MLUPS = 2000.0
REF = os.environ.get("LBM_REFERENCE_DIR", "/root/reference")
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
# 900 s: the K=4 Mosaic compile is ~350 s cold, but the remote compile
# helper can additionally be busy finishing a previously-killed client's
# compile (observed: a warm-cache run stalled past 480 s behind one) —
# an undersized timeout silently demotes the headline to the jax engine.
PALLAS_TIMEOUT_S = int(os.environ.get("LBM_BENCH_PALLAS_TIMEOUT", "900"))
# The D3Q19 bz=4/K=2 cold Mosaic compile measured ~15 min when its cache
# entry is invalidated (any d3q19_pallas.py edit shifts the source
# locations embedded in the serialized kernel and changes the cache key) —
# give the 3-D subprocess enough headroom to survive a cold start.
D3Q19_TIMEOUT_S = int(os.environ.get("LBM_BENCH_D3Q19_TIMEOUT", "1500"))
# 4096^2 K=8 secondary metric: a cold K=8 Mosaic compile plus the jax
# reference engine compile needs more headroom than the 3-D budget
D2_4096_TIMEOUT_S = int(os.environ.get("LBM_BENCH_4096_TIMEOUT", "2100"))
# 3-D timed window: 600 iters ~ 0.45 s — long enough that the tunnel's
# multi-ms dispatch jitter stays under ~1% (200 iters bounced 2,480-2,820
# MLUPS run to run). Shared by main() and the --d3q19-only subprocess.
D3_ITERS = 600
# 256^2-plane blocked-kernel secondary (round 4, VERDICT #6): same iter
# count (~0.29 s at the measured 4,417 MLUPS) and the slab budget — the
# blocked by=64/K=3 Mosaic compile is the same order as the slab's
D3_BLOCKED_ITERS = 600
D3_BLOCKED_TIMEOUT_S = int(os.environ.get("LBM_BENCH_D3_BLOCKED_TIMEOUT",
                                          "1500"))
# Blur secondary (round-5 VERDICT #2): two small Mosaic kernels (resident +
# banded K-pass) — compiles are seconds, the differential timing windows
# dominate (~10 dispatches of <=100 ms device time each over the tunnel)
BLUR_TIMEOUT_S = int(os.environ.get("LBM_BENCH_BLUR_TIMEOUT", "900"))


def _setup():
    import jax
    import jax.numpy as jnp

    from lbm_tpu.core import state
    from lbm_tpu.core.params import Obstacles, Params
    from lbm_tpu.ops import d2q9
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(CACHE_DIR)

    p = Params.from_file(f"{REF}/params/input_1024x1024.params")
    obs = Obstacles.from_file(f"{REF}/params/obstacles_1024x1024.dat", p)
    f0 = jnp.asarray(state.initial_distributions(p, np.float32))
    mask = jnp.asarray(obs.mask)
    aw = d2q9.AccelWeights.from_params(p)
    accel_row = p.ny - 2
    amask = d2q9.accel_row_mask(p.ny, p.nx, accel_row)
    f_start = d2q9.first_accelerate(f0, mask, accel_row=accel_row,
                                    accel_w1=aw.w1, accel_w2=aw.w2)
    return p, obs, f_start, mask, aw, accel_row, amask


def _time_runner(runner):
    # warm (same jit cache key), then time by materialising — the honest
    # barrier on the tunnel platform (see CLAUDE.md)
    return _time_runner_n(runner, NUM_STEPS)


def _time_runner_repeats(runner, n, repeats: int = 3):
    """All `repeats` timed windows (warm-up excluded), best first use.
    The per-candidate repeat list goes into the bench JSON so a
    round-over-round delta can be attributed to tunnel noise vs a real
    regression from the artifact alone (round-5 VERDICT #6)."""
    np.asarray(runner(n)[1])  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(runner(n)[1])
        times.append(time.perf_counter() - t0)
    return min(times), [round(t, 4) for t in times]


def prefix_rel_err(tots, mask, n_check: int = 100) -> float:
    """Max relative av_vels error over the first n_check steps vs golden —
    the shared correctness gate for main() and the pallas subprocess."""
    from lbm_tpu.core import io

    golden = io.read_av_vels(f"{REF}/check/1024x1024.av_vels.dat")
    av = (np.asarray(tots, np.float64)[:n_check]
          / float((~np.asarray(mask)).sum()))
    return float((np.abs(av - golden[:n_check]) / golden[:n_check]).max())


GATE_MAX_REL_ERR = 4e-4  # measured f32 floor + ~2x margin (see main())


def pallas_only() -> int:
    """Subprocess entry: print seconds (and the engine's OWN 100-step
    correctness error — a miscompiled kernel must fail here, not just be
    fast) for the pallas_k4 engine. The gate reuses the first 100 entries
    of the warm-up NUM_STEPS run — the SAME jit executable as the timed
    run, so the gate adds zero extra Mosaic compile (a second executable
    would double the cold-compile time past the subprocess timeout)."""
    from lbm_tpu.ops import d2q9_pallas

    p, obs, f_start, mask, aw, accel_row, amask = _setup()
    mask_f = mask.astype(f_start.dtype)

    def runner(n):
        return d2q9_pallas.run(
            f_start, mask_f, num_steps=n, omega=p.omega,
            accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row,
            band=128, k_steps=4)

    _, tots = runner(NUM_STEPS)  # compile + warm
    rel = prefix_rel_err(tots, mask)
    if rel > GATE_MAX_REL_ERR:
        print(json.dumps({"error": f"pallas correctness gate failed: "
                                   f"max rel err {rel:.2e}"}))
        return 1

    times = []
    for _ in range(3):  # best-of-3, same methodology as _time_runner_n
        t0 = time.perf_counter()
        np.asarray(runner(NUM_STEPS)[1])
        times.append(time.perf_counter() - t0)
    print(json.dumps({"seconds": min(times),
                      "repeats": [round(t, 4) for t in times],
                      "max_rel_err_100_steps": rel}))
    return 0


def manual_only() -> int:
    """Subprocess entry: the explicitly double-buffered engine
    (ops/d2q9_pallas_manual) at the flagship 1024^2 config, gated on its
    own 100-step golden prefix exactly like pallas_only."""
    from lbm_tpu.ops import d2q9_pallas_manual

    p, obs, f_start, mask, aw, accel_row, amask = _setup()
    mask_f = mask.astype(f_start.dtype)

    def runner(n):
        return d2q9_pallas_manual.run(
            f_start, mask_f, num_steps=n, omega=p.omega,
            accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row,
            band=128, k_steps=4)

    _, tots = runner(NUM_STEPS)  # compile + warm
    rel = prefix_rel_err(tots, mask)
    if rel > GATE_MAX_REL_ERR:
        print(json.dumps({"error": f"manual correctness gate failed: "
                                   f"max rel err {rel:.2e}"}))
        return 1

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(runner(NUM_STEPS)[1])
        times.append(time.perf_counter() - t0)
    print(json.dumps({"seconds": min(times),
                      "repeats": [round(t, 4) for t in times],
                      "max_rel_err_100_steps": rel}))
    return 0


def inplace_only() -> int:
    """Subprocess entry: the in-place aliased engine
    (ops/d2q9_pallas_inplace — one HBM stream instead of two) at the
    flagship 1024^2 config, gated on its own 100-step golden prefix
    exactly like pallas_only."""
    from lbm_tpu.ops import d2q9_pallas_inplace

    p, obs, f_start, mask, aw, accel_row, amask = _setup()
    mask_f = mask.astype(f_start.dtype)

    def runner(n):
        return d2q9_pallas_inplace.run(
            f_start, mask_f, num_steps=n, omega=p.omega,
            accel_w1=aw.w1, accel_w2=aw.w2, accel_row=accel_row,
            band=128, k_steps=4)

    _, tots = runner(NUM_STEPS)  # compile + warm
    rel = prefix_rel_err(tots, mask)
    if rel > GATE_MAX_REL_ERR:
        print(json.dumps({"error": f"inplace correctness gate failed: "
                                   f"max rel err {rel:.2e}"}))
        return 1

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(runner(NUM_STEPS)[1])
        times.append(time.perf_counter() - t0)
    print(json.dumps({"seconds": min(times),
                      "repeats": [round(t, 4) for t in times],
                      "max_rel_err_100_steps": rel}))
    return 0


def run_pallas_subprocess(cmd=None, timeout=None):
    """Run an engine timing in a subprocess; returns
    (info_dict | None, error | None) where info_dict is the subprocess's
    JSON line (always carrying "seconds"; "repeats" etc. ride along).
    Failures are always surfaced — a crashed/miscompiled pallas engine
    must show up in the bench JSON as `pallas_error`, never silently
    degrade to the jax engine number."""
    if cmd is None:
        cmd = [sys.executable, os.path.abspath(__file__), "--pallas-only"]
    if timeout is None:
        timeout = PALLAS_TIMEOUT_S
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout}s (cold Mosaic compile?)"
    except Exception as e:  # spawn failure etc.
        return None, f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip()[-500:]
        return None, f"rc={proc.returncode}: {tail}"
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            try:
                info = json.loads(line)
                info["seconds"]  # the contract every entry point honours
                return info, None
            except (ValueError, KeyError) as e:
                return None, f"bad subprocess JSON ({e}): {line[:200]}"
    return None, f"no JSON line in stdout: {proc.stdout.strip()[-300:]!r}"


PREFLIGHT_TIMEOUT_S = int(os.environ.get("LBM_BENCH_PREFLIGHT_TIMEOUT", "600"))


def _headline_error(err: str) -> str:
    """The one-JSON-line driver contract's failure shape, shared by the
    preflight and the correctness gate."""
    return json.dumps({
        "metric": "MLUPS/chip @1024x1024 D2Q9 f32",
        "value": 0.0, "unit": "MLUPS", "vs_baseline": 0.0,
        "error": err,
    })


def _tunnel_preflight(timeout_s: int = PREFLIGHT_TIMEOUT_S,
                      cmd=None) -> bool:
    """Bounded first contact with the device, in a SUBPROCESS. The
    remote-tunnel TPU worker can wedge (observed: a killed client's hung
    device program blocked every later attach for hours); without a guard
    the first jax op then hangs the whole bench unboundedly — and it hangs
    inside a C extension call that never releases the GIL, so an in-process
    SIGALRM cannot interrupt it (measured). On timeout, prints the headline
    JSON with an error field and returns False."""
    if cmd is None:
        cmd = [sys.executable, "-c",
               "import jax, numpy as np; "
               "np.asarray(jax.numpy.ones((8, 128)).sum())"]
    try:
        proc = subprocess.run(cmd, capture_output=True, timeout=timeout_s)
        if proc.returncode == 0:
            return True
        tail = (proc.stderr or b"").decode(errors="replace")[-300:]
        err = f"preflight device op failed rc={proc.returncode}: {tail}"
    except subprocess.TimeoutExpired:
        err = (f"TPU tunnel unresponsive: first device op did not "
               f"complete within {timeout_s}s")
    except Exception as e:  # spawn failure etc.
        err = f"preflight spawn failed: {type(e).__name__}: {e}"
    print(_headline_error(err))
    return False


def main() -> int:
    from lbm_tpu.ops import d2q9

    if not _tunnel_preflight():
        return 1

    p, obs, f_start, mask, aw, accel_row, amask = _setup()

    # --- correctness gate: 100-step av_vels prefix vs golden (f64 data).
    # Gated at the measured f32 floor + ~2x margin (round-1 TPU measurement:
    # 1.8e-4 over this prefix). The floor is state-rounding, not reduction
    # error — see experiments/f32-error-decomposition (f64 reduction moves
    # the error by <1e-6; only f64 state reaches the 1e-5 north-star). ---
    _, tot = d2q9.run(f_start, mask, amask, num_steps=100, omega=p.omega,
                      accel_w1=aw.w1, accel_w2=aw.w2)
    rel_max = prefix_rel_err(tot, mask)
    if rel_max > GATE_MAX_REL_ERR:
        print(_headline_error(
            f"correctness gate failed: max rel err {rel_max:.2e}"))
        return 1

    results = {}
    repeats = {}  # per-candidate raw repeat timings (round-5 VERDICT #6:
    # makes round-over-round deltas attributable to tunnel noise vs drift
    # from the artifact alone — the best-of-N winner hides the variance)
    results["jax"], repeats["jax"] = _time_runner_repeats(
        lambda n: d2q9.run(
            f_start, mask, amask, num_steps=n, omega=p.omega,
            accel_w1=aw.w1, accel_w2=aw.w2), NUM_STEPS)

    # pallas in a timeout-guarded subprocess (cold Mosaic compile can be slow)
    pallas_info, pallas_error = run_pallas_subprocess()
    if pallas_info is not None:
        results["pallas_k4"] = pallas_info["seconds"]
        repeats["pallas_k4"] = pallas_info.get("repeats")

    best_name = min(results, key=results.get)
    dt = results[best_name]
    mlups = NUM_STEPS * p.nx * p.ny / dt / 1e6

    import jax

    out = {
        "metric": "MLUPS/chip @1024x1024 D2Q9 f32",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / BASELINE_MLUPS, 3),
        "engine": best_name,
        "all_engines_seconds": {k: round(v, 4) for k, v in results.items()},
        "pallas_config": {"band": 128, "k_steps": 4,
                          "timeout_s": PALLAS_TIMEOUT_S},
        "correctness_max_rel_err_100_steps": rel_max,
        "device": str(jax.devices()[0]),
    }
    if pallas_error is not None:
        out["pallas_error"] = pallas_error

    # informational secondary metric: the 3-D stretch config, in the same
    # timeout-guarded subprocess pattern as the 2-D pallas engine so a cold
    # Mosaic compile hang/abort can never lose the headline line
    d3_iters = D3_ITERS
    d3_info, d3_err = run_pallas_subprocess(
        cmd=[sys.executable, os.path.abspath(__file__), "--d3q19-only"],
        timeout=D3Q19_TIMEOUT_S,
    )
    if d3_info is not None:
        out["d3q19_mlups_64x128x256"] = round(
            d3_iters * 64 * 128 * 256 / d3_info["seconds"] / 1e6, 1)
        repeats["d3q19"] = d3_info.get("repeats")
    else:
        out["d3q19_error"] = d3_err

    # informational secondary metric (round 4): the 256^2-plane shape that
    # routes to the in-place BLOCKED kernel (pick_engine: by=64/K=3 at
    # 32x256x256) so that routing path is driver-regression-visible, not
    # just experiment-CSV-pinned. Same guarded pattern + parity gate.
    d3b_info, d3b_err = run_pallas_subprocess(
        cmd=[sys.executable, os.path.abspath(__file__),
             "--d3q19-blocked-only"],
        timeout=D3_BLOCKED_TIMEOUT_S,
    )
    if d3b_info is not None:
        out["d3q19_blocked_mlups_32x256x256"] = round(
            D3_BLOCKED_ITERS * 32 * 256 * 256 / d3b_info["seconds"] / 1e6, 1)
        repeats["d3q19_blocked"] = d3b_info.get("repeats")
    else:
        out["d3q19_blocked_error"] = d3b_err

    # informational secondary metric: the largest non-resident grid config
    # (choose_config: band 64 / K=8 at 4096^2), same guarded pattern
    g4_info, g4_err = run_pallas_subprocess(
        cmd=[sys.executable, os.path.abspath(__file__), "--d2q9-4096-only"],
        timeout=D2_4096_TIMEOUT_S,
    )
    if g4_info is not None:
        out["d2q9_4096_mlups"] = round(
            D2_4096_ITERS * 4096 * 4096 / g4_info["seconds"] / 1e6, 1)
        repeats["d2q9_4096"] = g4_info.get("repeats")
    else:
        out["d2q9_4096_error"] = g4_err

    # blur secondary metrics (round-5 VERDICT #2): the only workload
    # family that previously had no per-round hardware regression guard.
    # Resident engine on the bricks shape (the reference's headline blur:
    # 899 us / 100x2 passes on one IPU half4 —
    # gaussian-blur-scaling/results.csv) + the banded K-pass engine on
    # the beyond-VMEM leaf shape. Differential timing inside the
    # subprocess (tunnel latency swamps absolute ms-scale windows).
    blur_info, blur_err = run_pallas_subprocess(
        cmd=[sys.executable, os.path.abspath(__file__), "--blur-only"],
        timeout=BLUR_TIMEOUT_S,
    )
    if blur_info is not None:
        out["blur_resident_us_per_pass"] = blur_info["resident_us_per_pass"]
        out["blur_pallas_leaf_us_per_pass"] = blur_info[
            "pallas_leaf_us_per_pass"]
        repeats["blur_resident_us"] = blur_info.get("resident_repeats_us")
        repeats["blur_pallas_us"] = blur_info.get("pallas_repeats_us")
    else:
        out["blur_error"] = blur_err

    # the explicitly-pipelined manual-DMA engine at the flagship config
    # (experiments/d2q9-overlap; hardware-validated round 3 and within
    # tunnel variance of the auto pipeline at 1024^2 — 11.5-12.0k across
    # runs). Still runs LAST so a failure cannot cost any other metric,
    # but on success it joins the headline candidate set (it passes the
    # same 100-step golden-prefix gate in its subprocess).
    man_info, man_err = run_pallas_subprocess(
        cmd=[sys.executable, os.path.abspath(__file__), "--manual-only"],
    )
    if man_info is not None:
        out["d2q9_manual_mlups"] = round(
            NUM_STEPS * p.nx * p.ny / man_info["seconds"] / 1e6, 1)
        results["pallas_manual_k4"] = man_info["seconds"]
        repeats["pallas_manual_k4"] = man_info.get("repeats")
    else:
        out["d2q9_manual_error"] = man_err

    # the in-place aliased engine at the flagship config (round 3: one
    # HBM stream instead of two — the measured-best engine at every grid
    # size, experiments/d2q9-overlap/results.csv). Runs VERY LAST (newest
    # kernel) and joins the headline candidate set on success, same
    # golden-prefix gate as every other candidate.
    ip_info, ip_err = run_pallas_subprocess(
        cmd=[sys.executable, os.path.abspath(__file__), "--inplace-only"],
    )
    if ip_info is not None:
        out["d2q9_inplace_mlups"] = round(
            NUM_STEPS * p.nx * p.ny / ip_info["seconds"] / 1e6, 1)
        results["pallas_inplace_k4"] = ip_info["seconds"]
        repeats["pallas_inplace_k4"] = ip_info.get("repeats")
    else:
        out["d2q9_inplace_error"] = ip_err
    best_name = min(results, key=results.get)
    if best_name != out["engine"]:
        mlups = NUM_STEPS * p.nx * p.ny / results[best_name] / 1e6
        out["value"] = round(mlups, 1)
        out["vs_baseline"] = round(mlups / BASELINE_MLUPS, 3)
        out["engine"] = best_name
    out["all_engines_seconds"] = {
        k: round(v, 4) for k, v in results.items()}
    out["repeats"] = {k: v for k, v in repeats.items() if v is not None}
    print(json.dumps(out))
    return 0


D2_4096_ITERS = 2000


def d2q9_4096_only() -> int:
    """Subprocess entry: print seconds for the 4096^2 kernel via
    choose_engine at its own choose_config (round 3: the in-place
    aliased pipeline at (band 64, K=2) — 15,186 MLUPS vs 11,606 for the
    automatic pipeline, experiments/d2q9-overlap/results.csv), gated
    against the pure-JAX engine on-device. There is no golden data at
    4096^2, so the gate is engine parity over a 100-step prefix of the
    per-step Sum|u| series — a Mosaic miscompile must fail HERE, on real
    TPU output, not just in the CPU interpret-mode tests."""
    import jax.numpy as jnp

    from lbm_tpu.ops import d2q9, d2q9_pallas
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(CACHE_DIR)
    n = 4096
    f = jnp.full((9, n, n), 0.1 / 9, jnp.float32)
    mask_b = jnp.zeros((n, n), bool)
    mask_f = mask_b.astype(f.dtype)
    w1, w2 = 0.1 * 0.005 / 9, 0.1 * 0.005 / 36
    engine = d2q9_pallas.choose_engine(n, n)
    if engine == "pallas-inplace":
        from lbm_tpu.ops import d2q9_pallas_inplace

        band, k = d2q9_pallas_inplace.choose_config(n, n)
        engine_run = d2q9_pallas_inplace.run
    elif engine == "pallas-manual":
        from lbm_tpu.ops import d2q9_pallas_manual

        band, k = d2q9_pallas.choose_config(n, n)
        engine_run = d2q9_pallas_manual.run
    else:
        band, k = d2q9_pallas.choose_config(n, n)
        engine_run = d2q9_pallas.run

    def runner(m):
        return engine_run(
            f, mask_f, num_steps=m, omega=1.85, accel_w1=w1, accel_w2=w2,
            accel_row=n - 2, band=band, k_steps=k)

    amask = d2q9.accel_row_mask(n, n, n - 2)
    _, tots_ref = d2q9.run(f, mask_b, amask, num_steps=96, omega=1.85,
                           accel_w1=w1, accel_w2=w2)
    _, tots = runner(96)
    # skip step 0 (Sum|u| = 0 on the uniform start state -> 0/0 -> nan,
    # and nan silently PASSES a `>` comparison)
    rel = float(jnp.max(jnp.abs(tots[1:] - tots_ref[1:])
                        / jnp.abs(tots_ref[1:])))
    if rel > GATE_MAX_REL_ERR:
        print(json.dumps({"error": f"4096^2 K={k} engine-parity gate "
                                   f"failed: max rel err {rel:.2e}"}))
        return 1

    dt, reps = _time_runner_repeats(runner, D2_4096_ITERS)
    print(json.dumps({"seconds": dt, "repeats": reps,
                      "parity_max_rel_err_96_steps": rel}))
    return 0


def d3q19_only(iters: int = D3_ITERS) -> int:
    """Subprocess entry: print seconds for the 3-D stretch config on the
    in-place aliased engine at K=3 (6,386 vs 3,253 MLUPS for the
    two-stream slab kernel at this shape; K=2 reads 5,131 and K=4 fails
    to compile — experiments/lbm3d-perf/inplace.csv), gated on engine
    parity vs the pure-JAX step over a short prefix (no golden data at
    this 3-D shape)."""
    import jax.numpy as jnp

    from lbm_tpu.ops import d3q19, d3q19_pallas_inplace
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(CACHE_DIR)
    nz, ny, nx = 64, 128, 256
    f = jnp.asarray(d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32))
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = True
    mask[-1] = True
    mask_b = jnp.asarray(mask)
    mask_f = mask_b.astype(f.dtype)

    def runner(n):
        return d3q19_pallas_inplace.run(
            f, mask_f, num_steps=n, k_steps=3, omega=1.85, density=0.1,
            accel=0.005, accel_plane=nz - 2, bz=4)

    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)
    _, tots_ref = d3q19.run(f, mask_b, amask, num_steps=24, omega=1.85,
                            density=0.1, accel=0.005)
    _, tots = runner(24)
    # skip step 0 (Sum|u| = 0 on the uniform start state -> 0/0)
    rel = float(jnp.max(jnp.abs(tots[1:] - tots_ref[1:])
                        / jnp.abs(tots_ref[1:])))
    if rel > GATE_MAX_REL_ERR:
        print(json.dumps({"error": f"d3q19 inplace engine-parity gate "
                                   f"failed: max rel err {rel:.2e}"}))
        return 1

    dt, reps = _time_runner_repeats(runner, iters)
    print(json.dumps({"seconds": dt, "repeats": reps,
                      "parity_max_rel_err_24_steps": rel}))
    return 0


def d3q19_blocked_only(iters: int = D3_BLOCKED_ITERS) -> int:
    """Subprocess entry: print seconds for the 256^2-plane blocked-kernel
    config (32x256x256). pick_engine routes this shape to the in-place
    (z,y)-blocked kernel at by=64/K=3 (4,417 MLUPS committed,
    experiments/lbm3d-perf/inplace.csv; the slab kernel's working set
    exceeds VMEM at 256^2 planes). Asserts the routing so a selector
    regression fails loudly, then gates on engine parity vs the pure-JAX
    step (no golden data at this 3-D shape)."""
    import jax.numpy as jnp

    from lbm_tpu.ops import d3q19, d3q19_pallas_inplace_blocked
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(CACHE_DIR)
    nz, ny, nx = 32, 256, 256
    kind, bz, by, k = d3q19_pallas_inplace_blocked.choose_k(
        nz, ny, nx, iters)
    if kind != "blocked":
        print(json.dumps({"error": f"routing regression: choose_k picked "
                                   f"{kind!r} (bz={bz}, by={by}, k={k}) for "
                                   f"{nz}x{ny}x{nx}, expected 'blocked'"}))
        return 1
    f = jnp.asarray(d3q19.initial_distributions(nz, ny, nx, 0.1, np.float32))
    mask = np.zeros((nz, ny, nx), bool)
    mask[0] = True
    mask[-1] = True
    mask_b = jnp.asarray(mask)
    mask_f = mask_b.astype(f.dtype)

    def runner(n):
        return d3q19_pallas_inplace_blocked.run(
            f, mask_f, num_steps=n, k_steps=k, omega=1.85, density=0.1,
            accel=0.005, accel_plane=nz - 2, bz=bz, by=by)

    amask = d3q19.accel_plane_mask(nz, ny, nx, nz - 2)
    _, tots_ref = d3q19.run(f, mask_b, amask, num_steps=24, omega=1.85,
                            density=0.1, accel=0.005)
    _, tots = runner(24)
    rel = float(jnp.max(jnp.abs(tots[1:] - tots_ref[1:])
                        / jnp.abs(tots_ref[1:])))
    if rel > GATE_MAX_REL_ERR:
        print(json.dumps({"error": f"d3q19 blocked engine-parity gate "
                                   f"failed: max rel err {rel:.2e}"}))
        return 1

    dt, reps = _time_runner_repeats(runner, iters)
    print(json.dumps({"seconds": dt, "repeats": reps,
                      "parity_max_rel_err_24_steps": rel,
                      "config": {"bz": bz, "by": by, "k": k}}))
    return 0


def blur_only() -> int:
    """Subprocess entry (round-5 VERDICT #2): per-pass blur cost on the
    reference's two headline image shapes — the VMEM-resident engine at the
    bricks padded shape (4x304x512; reference IPU half4 headline: 899 us /
    200 passes = 4.5 us/pass, gaussian-blur-scaling/results.csv:2-16) and
    the banded K-pass streaming engine at the leaf padded shape
    (4x1032x896). Differential timing — us/pass = median of
    (t(hi)-t(lo))/(hi-lo) — because the tunnel adds ~160 ms fixed latency
    with multi-ms jitter per dispatch (CLAUDE.md), which swamps absolute
    single-run windows of sub-ms kernels. Both engines gate on parity vs
    the conv engine (the XLA oracle) over 8 passes first."""
    import jax.numpy as jnp

    from lbm_tpu.ops import stencil
    from lbm_tpu.utils import profiling

    profiling.enable_compilation_cache(CACHE_DIR)
    t_wall0 = time.perf_counter()
    rng = np.random.default_rng(0)

    def make(h, w, h0, w0):
        interior = np.zeros((h, w), np.float32)
        interior[1:1 + h0, 1:1 + w0] = 1
        img = rng.random((4, h, w)).astype(np.float32) * interior
        return jnp.asarray(img), jnp.asarray(interior)

    img_b, int_b = make(304, 512, 302, 499)
    img_l, int_l = make(1032, 896, 1024, 768)

    # --- parity gates vs an f64 HOST oracle (values O(1); the f32 engines
    # land within summation-order rounding of it). A device-side oracle
    # (the conv engine) is not independent enough: its f32 conv gates at
    # ~1e-6 on CPU but would need MXU-precision slack on TPU ---
    def numpy_blur8(img, interior):
        x = np.asarray(img, np.float64)
        inter = np.asarray(interior, np.float64)
        for _ in range(8):
            ext = np.pad(x, ((0, 0), (1, 1), (1, 1)))
            acc = sum(stencil.KERNEL[i, j]
                      * ext[:, i:i + x.shape[1], j:j + x.shape[2]]
                      for i in range(3) for j in range(3))
            x = acc * inter
        return x

    res8_b = stencil.blur_resident(img_b, int_b, num_passes=8)
    err_res = float(np.max(np.abs(np.asarray(res8_b, np.float64)
                                  - numpy_blur8(img_b, int_b))))
    pal8_l = stencil.blur_many(img_l, int_l, num_iters=4, engine="pallas",
                               k_passes=8)
    err_pal = float(np.max(np.abs(np.asarray(pal8_l, np.float64)
                                  - numpy_blur8(img_l, int_l))))
    if err_res > 1e-4 or err_pal > 1e-4:
        print(json.dumps({"error": f"blur parity gate failed: resident "
                                   f"{err_res:.2e}, pallas {err_pal:.2e}"}))
        return 1

    def us_per_pass(run, n_lo, n_hi, repeats=5):
        def once(n):
            t0 = time.perf_counter()
            float(jnp.sum(run(n)))  # materialise a scalar checksum only
            return time.perf_counter() - t0

        once(n_lo), once(n_hi)  # compile + warm both windows
        deltas = []
        for _ in range(repeats):
            deltas.append((once(n_hi) - once(n_lo)) / (n_hi - n_lo))
        return (float(np.median(deltas)) * 1e6,
                [round(d * 1e6, 3) for d in deltas])

    # smoke mode (tests / CPU interpret): shrink the windows so the flow is
    # exercisable off-TPU; the reported us/pass is then meaningless
    smoke = bool(int(os.environ.get("LBM_BENCH_BLUR_SMOKE", "0")))

    # resident @bricks: ~2.5 us/pass measured -> ~29k passes ~ 72 ms device
    n_lo = 8 if smoke else 2000
    n_hi = n_lo + (8 if smoke else 2 * (int(1.8e10 / img_b.size) // 2))
    res_us, res_reps = us_per_pass(
        lambda n: stencil.blur_resident(img_b, int_b, num_passes=n),
        n_lo, n_hi, repeats=1 if smoke else 5)

    # K-pass streaming @leaf: HBM-bound; iters are pairs of passes and the
    # scan length is static, so lo/hi are two jit entries over one cached
    # pallas kernel
    it_lo, it_hi = (4, 8) if smoke else (100, 1300)  # pass-pairs
    pal_us, pal_reps = us_per_pass(
        lambda n: stencil.blur_many(img_l, int_l, num_iters=n // 2,
                                    engine="pallas", k_passes=8),
        2 * it_lo, 2 * it_hi, repeats=1 if smoke else 5)

    print(json.dumps({
        "seconds": time.perf_counter() - t_wall0,
        "resident_us_per_pass": round(res_us, 3),
        "pallas_leaf_us_per_pass": round(pal_us, 3),
        "resident_repeats_us": res_reps,
        "pallas_repeats_us": pal_reps,
        "parity_max_abs_err_8_passes": {"resident": err_res,
                                        "pallas": err_pal},
    }))
    return 0


def _time_runner_n(runner, n, repeats: int = 3):
    """Best-of-`repeats` timed runs after a warm-up. The tunnel platform
    adds multi-ms dispatch/fetch jitter per run (CLAUDE.md), so a single
    timed window bounces by several % — the minimum over a few runs is the
    honest compute estimate (noise here is strictly additive)."""
    return _time_runner_repeats(runner, n, repeats)[0]


if __name__ == "__main__":
    if "--pallas-only" in sys.argv:
        sys.exit(pallas_only())
    elif "--manual-only" in sys.argv:
        sys.exit(manual_only())
    elif "--inplace-only" in sys.argv:
        sys.exit(inplace_only())
    elif "--d3q19-only" in sys.argv:
        sys.exit(d3q19_only())
    elif "--d3q19-blocked-only" in sys.argv:
        sys.exit(d3q19_blocked_only())
    elif "--d2q9-4096-only" in sys.argv:
        sys.exit(d2q9_4096_only())
    elif "--blur-only" in sys.argv:
        sys.exit(blur_only())
    else:
        sys.exit(main())
