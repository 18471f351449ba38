"""Profiling, tracing and AOT-compilation utilities.

TPU recast of the reference's observability stack (SURVEY.md section 5):
  * `timed` — wall-clock step timing (utils::timedStep,
    main/include/GraphcoreUtils.hpp:130-138)
  * `trace` — jax.profiler traces, the analogue of Poplar engine
    instrumentation + graph.json/execution.json capture
    (GraphcoreUtils.hpp:27-66)
  * `dump_hlo` — compiler-IR dump, the analogue of DUMP_GRAPH_VIZ
    vertexgraph.dot / serialized capnp graphs (main/LbmAoS.cpp:374-389)
  * `enable_compilation_cache` / `aot_compile` — persistent compiled
    executables, the analogue of poplar::compileGraph + exe->serialize /
    Executable::deserialize AOT split (main/LbmPoplibs.cpp:376-389,
    main/LbmRunner.cpp:76-84)
  * `enable_nan_debugging` — the setFloatingPointBehaviour FP-trap analogue
    (main/LbmAoS.cpp:350-351)
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from pathlib import Path

import jax


def select_platform(device: str | None) -> None:
    """Pin the JAX platform for a ``--device`` CLI flag.

    'cpu' maps straight to ``jax_platforms``. 'tpu' must NOT: this image's
    TPU plugin registers its backend under the name 'axon', so
    ``jax_platforms='tpu'`` fails to initialise ("no jellyfish device")
    even though default resolution picks the TPU and reports
    ``Device.platform == 'tpu'``. So for 'tpu' we leave the config alone
    and verify what actually resolved.
    """
    if not device:
        return
    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return
    resolved = jax.devices()[0].platform
    if resolved != device:
        raise RuntimeError(
            f"--device {device} requested but the default backend resolved "
            f"to {resolved!r}")


@contextlib.contextmanager
def timed(description: str, file=sys.stderr):
    """Print '<description> took Xs' like the reference's timedStep."""
    t0 = time.perf_counter()
    yield
    print(f"{description} took {time.perf_counter() - t0:.4f}s", file=file)


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    with jax.profiler.trace(str(log_dir)):
        yield


def dump_hlo(fn, *args, path: str | Path | None = None, optimized: bool = False,
             **kw) -> str:
    """Return (and optionally write) the HLO for fn(*args)."""
    lowered = jax.jit(fn).lower(*args, **kw)
    text = (
        lowered.compile().as_text() if optimized else lowered.as_text()
    )
    if path is not None:
        Path(path).write_text(text)
    return text


def host_fingerprint() -> str:
    """Short stable hash of the host's CPU feature set and model name.

    CPU-backend cache entries are AOT machine code whose feature baseline
    (e.g. ``+prefer-no-gather``) is NOT part of JAX's cache key; loading an
    artifact compiled on a host with different features emits
    ``cpu_aot_loader.cc`` warnings and can SIGILL (observed when this
    working tree migrated hosts between rounds, MULTICHIP_r03). Keying the
    cache directory by this fingerprint makes a migrated tree start cold
    instead of loading foreign machine code."""
    import hashlib
    import platform
    import re

    try:
        text = Path("/proc/cpuinfo").read_text()
        flags = re.search(r"^(?:flags|Features)\s*:\s*(.*)$", text, re.M)
        model = re.search(r"^model name\s*:\s*(.*)$", text, re.M)
        ident = " ".join(sorted(flags.group(1).split())) if flags else ""
        ident += "|" + (model.group(1) if model else "")
    except OSError:
        ident = platform.processor() or platform.machine()
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | Path,
                             per_host: bool = True) -> None:
    """Persistent on-disk compilation cache: compiled executables survive
    process restarts (the AOT serialize/deserialize analogue).

    per_host=True (default) namespaces the directory by `host_fingerprint`
    so artifacts AOT-compiled for another machine's CPU features are never
    loaded (they would risk SIGILL — see host_fingerprint).

    Re-pointing an already-initialised cache needs an explicit reset —
    this JAX version keeps the first directory otherwise (writes silently
    keep landing in the old one)."""
    if per_host:
        cache_dir = Path(cache_dir) / f"host-{host_fingerprint()}"
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    new = os.path.realpath(str(cache_dir))
    prev = jax.config.jax_compilation_cache_dir
    if prev and os.path.realpath(prev) != new:
        from jax._src.compilation_cache import reset_cache

        reset_cache()
    jax.config.update("jax_compilation_cache_dir", new)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def aot_compile(fn, *args, **kw):
    """Ahead-of-time lower+compile; returns the compiled executable with
    cost analysis attached (reference: --compile-only mode,
    main/GaussianBlurLowLevel.cpp:263-279)."""
    return jax.jit(fn).lower(*args, **kw).compile()


def export_executable(fn, *args, path: str | Path, **kw) -> int:
    """Serialise a jitted computation to disk (the analogue of
    poplar::compileGraph + exe->serialize, main/LbmPoplibs.cpp:376-389).
    Returns the byte count written."""
    from jax import export as jax_export

    blob = jax_export.export(jax.jit(fn))(*args, **kw).serialize()
    Path(path).write_bytes(blob)
    return len(blob)


def load_executable(path: str | Path):
    """Deserialise an exported computation; call via `.call(*args)`
    (the analogue of Executable::deserialize, main/LbmRunner.cpp:81-84)."""
    from jax import export as jax_export

    return jax_export.deserialize(Path(path).read_bytes())


def enable_nan_debugging() -> None:
    """Trap NaNs in every jitted computation (the FP-exception analogue)."""
    jax.config.update("jax_debug_nans", True)


def device_memory_stats() -> dict:
    """Per-device memory statistics (bytes), where the backend reports them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
