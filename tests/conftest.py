import os

# Unit tests run on a virtual 8-device CPU mesh so multi-chip sharding logic
# is exercised without TPU hardware. Benchmarks (bench.py) use the real chip.
# NB: the axon TPU hook (sitecustomize triggered by PALLAS_AXON_POOL_IPS)
# re-forces JAX_PLATFORMS=axon, so it must be disabled, not just overridden.
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
