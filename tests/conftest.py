import os

# Intent: prefer a CPU backend with 8 virtual devices.  In practice the
# axon sitecustomize hook runs at interpreter startup (before this file)
# and keeps the real TPU registered, so under the full environment the
# suite runs on the TPU — which is load-bearing: the Pallas kernels are
# gated by the normal test run.  In a plain environment (no axon hook,
# e.g. subprocesses spawned by tests, or CI without the tunnel) these
# settings take effect and everything falls back to CPU/interpret paths.
if not os.environ.get("PALLAS_AXON_POOL_IPS"):
    # plain CPU environment: the persistent compilation cache may hold
    # XLA:CPU AOT executables compiled on a DIFFERENT machine — this
    # shared vCPU migrates across hosts — and loading one can SEGFAULT
    # (the loader warns "machine type ... doesn't match ... SIGILL";
    # one entry crashed the whole suite, exit 139).  Key the CPU cache
    # directory by the machine's CPU signature: same machine stays
    # warm, a migrated host gets a fresh (safe) subdirectory.  TPU
    # (axon) runs keep the default dir — Mosaic artifacts are
    # machine-independent.
    if "ALFALFA_JAX_CACHE" not in os.environ:
        import hashlib
        try:
            with open("/proc/cpuinfo") as _f:
                _sig = "".join(l for l in _f
                               if l.startswith(("model name", "flags")))
        except OSError:
            _sig = "unknown"
        _key = hashlib.sha1(_sig.encode()).hexdigest()[:12]
        os.environ["ALFALFA_JAX_CACHE"] = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache", f"cpu-{_key}")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


def fixture_manifest():
    import json
    with open(FIXTURES / "manifest.json") as f:
        return json.load(f)
