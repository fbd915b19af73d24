import os

# Intent: prefer a CPU backend with 8 virtual devices.  In practice the
# axon sitecustomize hook runs at interpreter startup (before this file)
# and keeps the real TPU registered, so under the full environment the
# suite runs on the TPU — which is load-bearing: the Pallas kernels are
# gated by the normal test run.  In a plain environment (no axon hook,
# e.g. subprocesses spawned by tests, or CI without the tunnel) these
# settings take effect and everything falls back to CPU/interpret paths.
if not os.environ.get("PALLAS_AXON_POOL_IPS"):
    # plain CPU environment: loading persisted XLA:CPU AOT executables
    # is unreliable here — the loader warns "machine type ... doesn't
    # match ... SIGILL" (this shared vCPU migrates across hosts) and
    # deserializing the big inter-encode executable SEGFAULTS the whole
    # suite (exit 139 inside compilation_cache.get_executable_and_time)
    # even for entries written moments earlier by the SAME machine.
    # Disable the persistent cache off-TPU: in-process jit caching still
    # works, each suite run just pays its own CPU compiles.  TPU (axon)
    # runs keep the cache — Mosaic artifacts load reliably and are the
    # expensive ones.
    os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")
    # the XLA:CPU compile of the big serial inter kernel has crashed
    # with SIGSEGV deep inside the compiler under full-suite conditions;
    # give the main thread the full stack the kernel's recursion wants
    try:
        import resource
        _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
        if _soft != resource.RLIM_INFINITY:
            resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ImportError, ValueError, OSError):
        pass
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
