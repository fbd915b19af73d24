"""On-chip Salsify 720p design-point measurement (VERDICT r4 item 4).

Measures steady-state per-frame encode latency of the rt interframe
path on the real TPU, for both the serial raster kernel and the fast
split pipeline, plus the fused 2-QP speculative pair.  Prints p50/p95
and the per-stage split (ALFALFA_TIMINGS accumulators).

The axon tunnel adds a fixed RPC floor (~10 ms per pipelined H2D
transfer, ~30 ms per synchronous fetch — see ROUND4.md "tunnel facts")
that does not exist on a locally attached TPU; the report prints the
fetch-dominated stages separately so the compute-side number is visible
next to the wall number.

Usage: python tools/bench_salsify.py [n_frames] (default 20)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
W, H, QI = 1280, 720, 48


def run(fast, fused=False, n=N):
    os.environ["ALFALFA_FAST_INTER"] = "1" if fast else "0"
    import numpy as np
    from alfalfa_tpu.encoder import Encoder
    from alfalfa_tpu.util import tracing
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "fixtures"))
    from gen_inputs import gen_clip

    clip = list(gen_clip(W, H, 8, seed=11)) * ((n + 9) // 8)
    enc = Encoder(W, H, device_encode=True, quality="rt")
    enc.encode_with_quantizer(clip[0], QI, key_frame=True)

    if fused:
        import copy
        from alfalfa_tpu.bitstream.header import QuantIndices
        from alfalfa_tpu.encoder.encode_inter_fast import (
            encode_interframe_fast_multiqp)
        encs = [enc, copy.deepcopy(enc)]
        # warmup/compile
        encode_interframe_fast_multiqp(
            [copy.deepcopy(e) for e in encs], clip[1],
            [QuantIndices(y_ac_qi=QI), QuantIndices(y_ac_qi=QI + 16)],
            update=False)
        times = []
        for i in range(2, n + 2):
            t0 = time.perf_counter()
            encode_interframe_fast_multiqp(
                encs, clip[i % len(clip)],
                [QuantIndices(y_ac_qi=QI), QuantIndices(y_ac_qi=QI + 16)],
                update=False)
            times.append((time.perf_counter() - t0) * 1000)
    else:
        # warmup (compiles the interframe step)
        enc.encode_with_quantizer(clip[1], QI, key_frame=False)
        tracing.enable(True)
        times = []
        for i in range(2, n + 2):
            t0 = time.perf_counter()
            enc.encode_with_quantizer(clip[i % len(clip)], QI,
                                      key_frame=False)
            times.append((time.perf_counter() - t0) * 1000)
    p50, p95 = np.percentile(times, [50, 95])
    label = ("fast+fused" if fused else ("fast" if fast else "serial"))
    print(f"salsify 720p {label}: p50={p50:.1f} ms p95={p95:.1f} ms "
          f"min={min(times):.1f} (n={len(times)})", flush=True)
    tracing.report()
    tracing.enable(False)
    return p50, p95


def run_kernel_only(n=N):
    """Isolate the device dispatch: time the jitted fast_fn alone,
    fencing each iteration with a scalar fetch (the only trustworthy
    fence over the axon tunnel — ROUND4.md tunnel facts)."""
    os.environ["ALFALFA_FAST_INTER"] = "1"
    import numpy as np
    import jax.numpy as jnp
    from alfalfa_tpu.encoder import Encoder
    from alfalfa_tpu.encoder.encode_inter_fast import _fast_fn
    from alfalfa_tpu.encoder.encode_inter_device import (_kernel_inputs,
                                                         _scalars_for)
    from alfalfa_tpu.bitstream.header import QuantIndices
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests", "fixtures"))
    from gen_inputs import gen_clip

    clip = list(gen_clip(W, H, 2, seed=11))
    enc = Encoder(W, H, device_encode=True, quality="rt")
    enc.encode_with_quantizer(clip[0], QI, key_frame=True)
    qi = QuantIndices(y_ac_qi=QI)
    orig, planes, tables = _kernel_inputs(enc, clip[1], False)
    scalars = jnp.asarray(_scalars_for(qi))
    fn = _fast_fn(enc.mb_rows, enc.mb_cols, False)
    out = fn(*planes, scalars, *tables)       # compile
    float(jnp.ravel(out[2])[0])
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*planes, scalars, *tables)
        _ = float(jnp.ravel(out[2])[0])       # fence
        times.append((time.perf_counter() - t0) * 1000)
    p50, p95 = np.percentile(times, [50, 95])
    print(f"salsify 720p kernel-only: p50={p50:.1f} ms p95={p95:.1f} ms "
          f"min={min(times):.1f} (n={n}; includes one ~30 ms tunnel "
          f"fetch RTT)", flush=True)


if __name__ == "__main__":
    import jax
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if which in ("all", "kernel"):
        run_kernel_only(max(6, N // 2))
    if which in ("all", "fast"):
        run(fast=True)
    if which in ("all", "fused"):
        run(fast=True, fused=True)
    if which in ("all", "serial"):
        run(fast=False, n=max(4, N // 4))
