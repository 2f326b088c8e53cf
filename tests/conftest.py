"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding tests use a
virtual mesh, per the build environment: real multi-chip TPU hardware is
not available in CI) and float64 enabled to match the reference's 1e-7
default tolerances (/root/reference/src/python/coneprog.py:440-454).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS; updating the config after import reliably selects CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# NO persistent compilation cache for the CPU test suite: this
# environment's XLA:CPU AOT executable serialization is unsafe — the
# loader warns "machine features ... could lead to execution errors
# such as SIGILL" and deserializing entries (even same-machine ones)
# intermittently SEGFAULTS inside
# compilation_cache.get_executable_and_time (measured r04, twice,
# at different cache directories).  A cold suite run costs ~7 min of
# CPU compiles — correctness over convenience.  The TPU benchmark
# path keeps its cache (bench.py): TPU executables are compiled and
# serialized server-side and have never exhibited the crash.


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test MODULES.

    The full suite (~300 tests) segfaults inside XLA:CPU's
    backend_compile_and_load once enough JITted executables are
    resident (measured r04: deterministic position in the suite,
    independent of the specific test, of the persistent cache, and of
    free RAM — the classic JIT code-span/relocation failure mode).
    Clearing jax's caches and the solver-factory lru_caches at module
    boundaries bounds resident compiled code; modules pay a few
    recompiles, the one-command `pytest tests/` stays green."""
    yield
    import jax
    from cvxopt_tpu import conelp as _conelp, coneqp as _coneqp
    from cvxopt_tpu import simplex as _simplex
    for fn in (_conelp.make_conelp, _conelp.make_conelp_cascade,
               _conelp.make_conelp_ws, _conelp.make_conelp_ws_detect,
               _coneqp.make_coneqp, _coneqp.make_coneqp_cascade,
               _simplex.make_simplex):
        try:
            fn.cache_clear()
        except AttributeError:
            pass
    jax.clear_caches()
