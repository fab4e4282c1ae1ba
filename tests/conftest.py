"""Test configuration: force a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend at interpreter
start and pins JAX_PLATFORMS=axon, so env vars alone don't stick — we must
flip the platform through jax.config after import. XLA_FLAGS must be set
before the first backend instantiation. Real-TPU benchmarks live in bench.py,
not the test suite.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# NOTE: the thunk executor can deadlock multi-collective mesh programs on
# a starved 1-core host (per-device collective order inversion — see
# __graft_entry__.dryrun_multichip, which retries in a fresh process).
# The old --xla_cpu_use_thunk_runtime=false escape hatch is a no-op in
# this jaxlib ("no longer supported"), so tests that execute (not just
# lower) multi-collective mesh programs should keep them small and/or
# run them in a subprocess like test_graft_dryrun_multichip does.
os.environ["XLA_FLAGS"] = flags
# moondream_tpu/__init__.py re-applies JAX_PLATFORMS through jax.config
# (restoring standard env semantics the axon sitecustomize breaks) — the
# env var must agree with the config flip below, and it also makes every
# subprocess a test spawns (CLI smokes) hermetic on CPU.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable when pytest is invoked from elsewhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    """Allow tests to import the reference torch implementation as a golden
    oracle (numerical comparison only — we never ship its code)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
