"""ASAN/UBSAN gate for the native layer.

The reference builds with `-fsanitize=address -fsanitize=undefined` under
`./configure --enable-debug` and runs distcheck that way
(/root/reference/configure.ac:29-47, Makefile.am:2).  Our native C++
(bitwork.cc / mbparse.cc / tokensimd.cc / enckernel.cc / lfkernel.cc)
parses untrusted bitstreams with manual index arithmetic — this test
runs tools/sanitize_fuzz.py (bit-exact corpus decode, all four token
engines, truncation/byte-flip fuzz, host encode roundtrips) against
sanitized builds (ALFALFA_SANITIZE=1 in native/_build.py) with libasan
preloaded.

The driver is deliberately jax-free: preloading the sanitizer runtime is
process-wide, and jaxlib's statically linked C++ runtime throws through
ASAN's interceptors before they are bound (real___cxa_throw == 0 check),
so the sanitized process must never import jax.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent


@pytest.mark.slow
def test_native_layer_under_asan_ubsan():
    lib = subprocess.run(["g++", "-print-file-name=libasan.so"],
                         capture_output=True, text=True).stdout.strip()
    if not lib or not os.path.exists(lib):
        pytest.skip("libasan not available")
    env = dict(os.environ,
               ALFALFA_SANITIZE="1",
               LD_PRELOAD=lib,
               # leak detection trips over Python allocations that live
               # until exit; the classes we're hunting are overflows and
               # UB, which abort via -fno-sanitize-recover
               ASAN_OPTIONS="detect_leaks=0:abort_on_error=1",
               UBSAN_OPTIONS="halt_on_error=1")
    r = subprocess.run([sys.executable, "tools/sanitize_fuzz.py"],
                       env=env, cwd=REPO, capture_output=True, text=True,
                       timeout=3600)
    assert r.returncode == 0 and "all stages passed" in r.stdout, (
        f"sanitized run failed (rc {r.returncode})\n--- stdout ---\n"
        f"{r.stdout[-4000:]}\n--- stderr ---\n{r.stderr[-4000:]}")
