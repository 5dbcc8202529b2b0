"""Persistent XLA compilation cache (QD_COMPILE_CACHE).

The full coupled model compiles in ~30-60 s per scan-chunk variant — the
dominant cost of short `scripts.run_simulation` probes and of every process
restart in a spin-up resume chain (docs/perf-notes.md "Runner overheads").
JAX's persistent compilation cache serializes the compiled executable keyed
by (HLO, compiler flags, device kind), so a restarted process with the same
config skips straight to execution.

The reference has no counterpart (nothing to compile); this is runtime
infrastructure of the TPU rebuild. Opt-out with QD_COMPILE_CACHE=0;
QD_COMPILE_CACHE_DIR overrides the location (default
~/.cache/qingdai_tpu/xla).
"""

from __future__ import annotations

import os

_DONE = False


def setup_from_env(verbose: bool = False) -> str | None:
    """Enable the persistent cache once per process. Returns the cache dir
    (None when disabled). Safe to call before or after backend init — the
    cache is consulted at compile time.

    TPU-only by default: XLA:CPU serializes AOT executables whose recorded
    machine-feature list can mismatch the loading host ("could lead to
    SIGILL" loader warnings observed with the forced-CPU test backend), and
    the CPU paths are test-only anyway. QD_COMPILE_CACHE_DIR being set
    explicitly overrides the backend gate (the knob tests use it)."""
    global _DONE
    if os.getenv("QD_COMPILE_CACHE", "1").lower() in ("0", "false"):
        return None
    path = os.getenv("QD_COMPILE_CACHE_DIR")
    if path is None:
        try:
            import jax
            if jax.default_backend() != "tpu":
                return None
        except Exception:
            return None
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "qingdai_tpu", "xla")
    if _DONE:
        return path
    try:
        os.makedirs(path, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", path)
        # the default 1 s floor would skip small helper jits; keep them —
        # a spin-up restart replays dozens of them through the tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _DONE = True
        if verbose:
            print(f"[CompileCache] persistent XLA cache at {path}")
        return path
    except Exception as e:  # never block a run on cache plumbing
        if verbose:
            print(f"[CompileCache] disabled ({e})")
        return None
