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

# Persistent compilation cache: first test run pays XLA compiles,
# subsequent runs reload compiled executables from disk.
#
# MACHINE-KEYED directory for the CPU backend: jax's CPU cache key
# does not include the host's CPU feature set, and XLA:CPU AOT
# executables compiled on a different host SEGFAULT on load
# (measured r04: cross-machine .jax_cache entries crashed the test
# suite inside compilation_cache.get_executable_and_time, after many
# "machine features ... could lead to execution errors such as
# SIGILL" warnings).  Keying by the platform description isolates
# each machine's CPU executables.
import hashlib
import platform as _platform

_feat = hashlib.sha1(
    (_platform.processor() + _platform.machine()
     + _platform.node()).encode()).hexdigest()[:12]
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", f".jax_cache_cpu_{_feat}")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
