"""Shared build/load helper for the native (.cc) fast paths.

Libraries are compiled with -march=native, so a cached .so is only valid on
the CPU (and with the flags) it was built for.  We embed a fingerprint of
the compile flags + host CPU feature set + g++ version in the .so filename;
a flag change or a different host simply misses the cache and rebuilds,
instead of SIGILLing at call time (ADVICE r2).
"""
import ctypes
import functools
import hashlib
import os
import subprocess

FLAGS = ("-O3", "-march=native", "-shared", "-fPIC", "-pthread")


@functools.lru_cache()
def _host_tag():
    h = hashlib.sha1(" ".join(FLAGS).encode())
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    h.update(line)
                    break
    except OSError:
        pass
    try:
        h.update(subprocess.run(["g++", "-dumpfullversion"],
                                capture_output=True).stdout)
    except OSError:
        pass
    return h.hexdigest()[:10]


def load_library(src_path):
    """Compile (if needed) and dlopen the library for ``src_path``."""
    here = os.path.dirname(os.path.abspath(src_path))
    base = os.path.splitext(os.path.basename(src_path))[0]
    so = os.path.join(here, "lib%s.%s.so" % (base, _host_tag()))
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src_path)):
        subprocess.run(["g++", *FLAGS, "-o", so, src_path],
                       check=True, capture_output=True)
    return ctypes.CDLL(so)
