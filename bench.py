#!/usr/bin/env python3
"""Benchmark: 720p VP8 decode throughput vs the reference decoder.

Decodes G=8 independent GOPs in lockstep on one TPU chip (ExCamera-style
chunk parallelism, parallel/gop.py) and compares frames/s against the
reference's scalar decoder on this host (the reference's own deployment
model is one core per chunk; BASELINE.md targets >= 10x per chip).

Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CLIP = os.path.join(REPO, "tests", "fixtures", "inter_1280x720_q48.ivf")
ORACLE = os.path.join(REPO, "oracle", "build", "bin", "decode-to-stdout")
G = int(os.environ.get("ALFALFA_BENCH_G", "16"))  # GOPs in lockstep; the
# wavefront kernel's step count is batch-independent, so wider batches
# amortize per-step overheads whenever the device step is the wall
TRIALS = 3


def oracle_fps(clip, frames):
    """Reference decoder frames/s with the fixed per-run overhead
    (process spawn + IVF open + first-frame work) measured on a
    single-frame cut of the same stream and subtracted, so the headline
    divides by DECODE time, not process time (VERDICT r3 item 9)."""
    if not os.path.exists(ORACLE):
        try:
            subprocess.run(["make", "-C", os.path.join(REPO, "oracle"),
                            "-j", str(os.cpu_count() or 4)],
                           check=True, capture_output=True, timeout=900)
        except Exception:
            return None, None
    one = "/tmp/bench_oracle_1f.ivf"
    from alfalfa_tpu.util.ivf import IVFReader, IVFWriter
    rd = IVFReader(clip)
    with IVFWriter(one, width=rd.width, height=rd.height) as wr:
        wr.append_frame(rd.frame(0))
    subprocess.run([ORACLE, clip], stdout=subprocess.DEVNULL, check=True)
    best = float("inf")
    overhead = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(G):
            subprocess.run([ORACLE, one], stdout=subprocess.DEVNULL,
                           check=True)
        overhead = min(overhead, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(G):
            subprocess.run([ORACLE, clip], stdout=subprocess.DEVNULL,
                           check=True)
        best = min(best, time.perf_counter() - t0)
    return (G * (frames - 1) / max(best - overhead, 1e-9),
            overhead * 1000 / G)


def our_fps(clip, frames):
    import hashlib
    import numpy as np
    import jax
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.parallel.gop import BatchedGopDecoder
    from alfalfa_tpu.state.decoder_state import Raster

    ivf = IVFReader(clip)
    payloads = [ivf.frame(i) for i in range(len(ivf))]

    # warmup (compiles the keyframe + interframe steps), doubling as the
    # bit-exactness gate: SHA-1(on-chip decoded YUV) must equal the
    # oracle manifest hash — the reference's decoding.test contract —
    # before any throughput number is printed (VERDICT r3 item 2)
    with open(os.path.join(REPO, "tests", "fixtures",
                           "manifest.json")) as fh:
        want = json.load(fh)[os.path.basename(clip)]["yuv_sha1"]
    # compile pass on the MAIN thread: under axon, a first-ever jit
    # compile issued from decode_stream's worker thread wedges the client
    # (fetches of its outputs never complete); decode_frame_batch compiles
    # the same step jits main-thread, after which the stream is safe
    dec = BatchedGopDecoder(ivf.width, ivf.height, G)
    for p in payloads:
        dec.decode_frame_batch([p] * G)

    dec = BatchedGopDecoder(ivf.width, ivf.height, G)
    digests = [hashlib.sha1() for _ in range(G)]
    # the gate runs decode_stream — the SAME pipelined path the timed loop
    # uses — so bit_exact certifies the path being timed (VERDICT r4 item 5)
    for (y, u, v), show in dec.decode_stream([p] * G for p in payloads):
        ya, ua, va = np.asarray(y), np.asarray(u), np.asarray(v)
        for g in range(G):
            if show[g]:
                digests[g].update(Raster(ivf.width, ivf.height, ya[g],
                                         ua[g], va[g]).dump_bytes())
    jax.block_until_ready(y)
    check = all(d.hexdigest() == want for d in digests)

    REPS = 3  # steady-state throughput: amortize per-clip overheads
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            dec = BatchedGopDecoder(ivf.width, ivf.height, G)
            # pipelined decode: upload + step dispatch of frame i overlap
            # the host parse of frame i+1 (parallel/gop.decode_stream)
            for (y, u, v), _ in dec.decode_stream([p] * G
                                                  for p in payloads):
                pass
        import numpy as _np
        import jax.numpy as jnp
        _ = float(jnp.ravel(y)[0])  # force full execution over the tunnel
        best = min(best, (time.perf_counter() - t0) / REPS)
    return G * frames / best, check


def encode_metric(clip):
    """Secondary metric (stderr): 720p keyframe encode on the device
    wavefront encoder vs the reference xc-enc, ms/frame."""
    import numpy as np
    from alfalfa_tpu.decoder import FilePlayer
    from alfalfa_tpu.encoder import Encoder

    frames = [r.display() for r in FilePlayer(clip)][:2]
    W, H = 1280, 720
    enc = Encoder(W, H, device_encode=True)
    enc.encode_with_quantizer(frames[0], 48, key_frame=True)  # compile
    best = float("inf")
    for _ in range(3):
        e = Encoder(W, H, device_encode=True)
        t0 = time.perf_counter()
        e.encode_with_quantizer(frames[1], 48, key_frame=True)
        best = min(best, time.perf_counter() - t0)
    ref_ms = None
    y4m = "/tmp/bench_kf720.y4m"
    try:
        sys.path.insert(0, os.path.join(REPO, "tests", "fixtures"))
        from gen_inputs import write_y4m
        write_y4m(y4m, frames[:1], W, H)
        t0 = time.perf_counter()
        subprocess.run([os.path.join(REPO, "oracle", "build", "bin",
                                     "xc-enc"), "-i", "y4m", "-o",
                        "/tmp/bench_kf720.ivf", "--y-ac-qi", "48", y4m],
                       check=True, capture_output=True, timeout=120)
        ref_ms = (time.perf_counter() - t0) * 1000
    except Exception:
        pass
    print(f"secondary: kf_encode_720p_device_ms={best * 1000:.0f} "
          f"reference_ms={ref_ms and round(ref_ms)}", file=sys.stderr)


def inter_encode_metric(clip):
    """Secondary metric (stderr): 720p INTER encode on the device raster
    kernel (realtime quality, the Salsify design point) vs the reference
    xc-enc per-frame ms."""
    from alfalfa_tpu.decoder import FilePlayer
    from alfalfa_tpu.encoder import Encoder

    frames = [r.display() for r in FilePlayer(clip)][:5]
    W, H = 1280, 720
    enc = Encoder(W, H, device_encode=True, quality="rt")
    enc.encode_with_quantizer(frames[0], 48, key_frame=True)
    enc.encode_with_quantizer(frames[1], 48)         # compile inter step
    best = float("inf")
    for f in frames[2:]:
        t0 = time.perf_counter()
        enc.encode_with_quantizer(f, 48)
        best = min(best, time.perf_counter() - t0)

    ref_ms = None
    try:
        sys.path.insert(0, os.path.join(REPO, "tests", "fixtures"))
        from gen_inputs import write_y4m
        y4m = "/tmp/bench_inter720.y4m"
        write_y4m(y4m, frames, W, H)
        out = subprocess.run(
            [os.path.join(REPO, "oracle", "build", "bin", "xc-enc"),
             "-i", "y4m", "-o", "/tmp/bench_inter720.ivf",
             "--y-ac-qi", "48", y4m],
            check=True, capture_output=True, timeout=600)
        import re
        ms = [float(m) for m in re.findall(r"done \((\d+(?:\.\d+)?) ms\)",
                                           out.stderr.decode())]
        if len(ms) > 1:
            ref_ms = min(ms[1:])        # per-frame inter encode
    except Exception:
        pass
    fast_best = None
    try:
        # the Salsify fast split pipeline (ALFALFA_FAST_INTER): decisions
        # kernel + dense batched math + device intra fixup + device LF
        os.environ["ALFALFA_FAST_INTER"] = "1"
        enc = Encoder(W, H, device_encode=True, quality="rt")
        enc.encode_with_quantizer(frames[0], 48, key_frame=True)
        enc.encode_with_quantizer(frames[1], 48)     # compile fast step
        enc.encode_with_quantizer(frames[2], 48)     # steady-state jits
        fast_best = float("inf")
        for f in frames[3:]:
            t0 = time.perf_counter()
            enc.encode_with_quantizer(f, 48)
            fast_best = min(fast_best, time.perf_counter() - t0)
    except Exception as e:
        print(f"fast inter metric failed: {e!r}", file=sys.stderr)
    finally:
        os.environ.pop("ALFALFA_FAST_INTER", None)

    print(f"secondary: inter_encode_720p_device_ms={best * 1000:.0f} "
          f"reference_ms={ref_ms and round(ref_ms)} "
          f"fast_path_ms={fast_best and round(fast_best * 1000)}",
          file=sys.stderr)


def gop_scaling_metric():
    """Tertiary (stderr): GOP-parallel scaling efficiency, measured the
    moment more than one device is attached (BASELINE.md target >= 80%).
    Per-device work is one frame's reconstruction; efficiency =
    t(1 chunk on 1 device) / t(N chunks on N devices).  Smoke-testable
    off-hardware on the virtual CPU mesh (JAX_PLATFORMS=cpu +
    xla_force_host_platform_device_count; ALFALFA_SCALING_RC shrinks
    the geometry)."""
    import jax
    import jax.numpy as jnp
    from alfalfa_tpu.parallel import gop

    devs = jax.devices()
    if len(devs) < 2:
        return
    R, C = (int(x) for x in
            os.environ.get("ALFALFA_SCALING_RC", "45,80").split(","))
    n = len(devs)

    def timed(step, batch):
        out = step(*batch)
        jax.block_until_ready(out[0])          # compile + settle
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = step(*batch)
            _ = float(jnp.ravel(out[0])[0])    # full execution fence
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(gop.gop_decode_step(gop.make_gop_mesh(devs[:1]), R, C),
               gop.example_frame_batch(1, R, C))
    tn = timed(gop.gop_decode_step(gop.make_gop_mesh(devs), R, C),
               gop.example_frame_batch(n, R, C))
    print(f"tertiary: gop_scaling_efficiency={t1 / tn:.3f} over {n} "
          f"devices at {C * 16}x{R * 16} (t1={t1 * 1e3:.1f}ms "
          f"tN={tn * 1e3:.1f}ms; target >= 0.80)", file=sys.stderr)


def _tpu_alive(timeout=180):
    """Probe jax backend init in a THROWAWAY subprocess.  When the axon
    relay is down, backend registration hangs forever inside jax.devices();
    probing in a child under a timeout keeps this process healthy."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import sys; sys.exit(0 if d and d[0].platform != 'cpu' else 3)"],
            timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _host_parse_probe():
    """Tunnel-down evidence: measure the HOST half of the decode step
    (bit-serial parse + packing) in a CPU-only child with the axon hook
    disabled.  Returns a short string or None."""
    code = r"""
import time, numpy as np
from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder
ivf = IVFReader("tests/fixtures/inter_1280x720_q48.ivf")
payloads = [ivf.frame(i) for i in range(len(ivf))]
G = 16
dec = BatchedGopDecoder(ivf.width, ivf.height, G)
for p in payloads[:2]:
    dec.parse_frame_batch([p] * G)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for p in payloads[2:]:
        dec.parse_frame_batch([p] * G)
    best = min(best, (time.perf_counter() - t0) / (len(payloads) - 2))
print(f"{best * 1000 / G:.2f}")
"""
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                           capture_output=True, timeout=600)
        if r.returncode == 0:
            ms = float(r.stdout.decode().strip().splitlines()[-1])
            return (f"host parse measured CPU-only: {ms:.2f} ms/frame at "
                    f"G=16 lockstep (10x target needs < ~2.7 ms/frame "
                    f"total with the device step overlapped)")
    except Exception:
        pass
    return None


def _fallback_line(note):
    probe = _host_parse_probe()
    if probe:
        note = note + "; " + probe
    print(json.dumps({
        "metric": "vp8_decode_720p_fps_8gop",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": None,
        "note": note,
    }), flush=True)


def our_fps_at(clip, frames, g):
    global G
    saved, G = G, g
    try:
        return our_fps(clip, frames)
    finally:
        G = saved


def main():
    """Watchdog wrapper: probe the TPU tunnel, then run the real bench in a
    child process under a hard timeout.  A dead axon relay makes jax backend
    init hang forever; without this the driver's bench run would record
    nothing at all."""
    if os.environ.get("ALFALFA_BENCH_INNER") == "1":
        inner_main()
        return
    alive = _tpu_alive()
    retries = 0
    while not alive and retries < 2:
        retries += 1
        time.sleep(120)
        alive = _tpu_alive()
    if not alive:
        _fallback_line("tpu tunnel unreachable (jax backend init hung); "
                       "see ROUND3.md — all round-3 TPU work is gated by "
                       "interpret-mode parity + jax.export cross-lowering")
        return
    env = dict(os.environ, ALFALFA_BENCH_INNER="1")
    p = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                         env=env, stdout=subprocess.PIPE, stderr=sys.stderr,
                         start_new_session=True)
    try:
        # budget: a cold compile cache costs ~13 min before the first
        # number (axon remote compiles currently miss the persistent
        # jax cache across processes)
        out, _ = p.communicate(timeout=5400)
    except subprocess.TimeoutExpired:
        import signal as _sig
        try:
            os.killpg(p.pid, _sig.SIGKILL)
        except OSError:
            p.kill()
        out, _ = p.communicate()
    text = out.decode(errors="replace")
    sys.stdout.write(text)
    sys.stdout.flush()
    if '"metric"' not in text:
        _fallback_line("bench inner process died or timed out mid-run "
                       "(tunnel dropped?); partial stderr above")


def _host_desc():
    try:
        model = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
        return f"{os.cpu_count()} cpus, {model}"
    except OSError:
        return "unknown"


def inner_main():
    sys.path.insert(0, REPO)
    print(f"host: {_host_desc()}", file=sys.stderr)
    from alfalfa_tpu.util.ivf import IVFReader

    frames = IVFReader(CLIP).frame_count
    t_first = time.perf_counter()
    ours, bit_exact = our_fps(CLIP, frames)
    t_first = time.perf_counter() - t_first
    best_g = G
    # lockstep width is free ExCamera parallelism: when the device step is
    # the wall, wider batches amortize it (kernel step count is batch-
    # independent).  Keep doubling the width while it helps and the time
    # budget allows (the native parse + wavefront kernel support G <= 32).
    if "ALFALFA_BENCH_G" not in os.environ:
        g = G
        spent = t_first
        while g * 2 <= 32 and spent < 360:
            try:
                t0 = time.perf_counter()
                ours2, exact2 = our_fps_at(CLIP, frames, g * 2)
                spent += time.perf_counter() - t0
                print(f"sweep: G={g} -> {ours:.2f} fps, G={g * 2} -> "
                      f"{ours2:.2f} fps (bit_exact={exact2})",
                      file=sys.stderr)
                if ours2 <= ours or not exact2:
                    break
                ours, best_g, g, bit_exact = ours2, g * 2, g * 2, exact2
            except Exception as e:
                print(f"G-sweep stopped: {e!r}", file=sys.stderr)
                break
    ref, ref_overhead_ms = oracle_fps(CLIP, frames)
    # headline first: the secondary metric may spend minutes compiling the
    # encode kernel on a cold cache
    print(json.dumps({
        "metric": "vp8_decode_720p_fps_8gop",
        "value": round(ours, 2),
        "unit": "frames/s",
        "vs_baseline": round(ours / ref, 3) if ref else None,
        "gops_in_lockstep": best_g,
        "bit_exact": bit_exact,
        # encode secondaries below compare one TPU chip against ONE core of
        # THIS host — absolute xc-enc ms varies ~4x across bench hosts
        # (r2 multi-core host: 202 ms/KF; r4 1-core 2.1 GHz host: 875 ms)
        "host": _host_desc(),
        "baseline_note": ("reference fps is decode-only: per-run spawn/IO "
                          f"overhead {ref_overhead_ms:.0f} ms measured on a "
                          "1-frame cut and subtracted"
                          if ref_overhead_ms is not None else None),
    }), flush=True)
    # secondary metric under a hard budget: a cold Mosaic cache can spend
    # minutes compiling the encode kernel, and the headline must not hang
    import signal

    def _bail(signum, frame):
        raise TimeoutError("encode metric budget exceeded")

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(420)
    try:
        encode_metric(CLIP)
    except Exception as e:
        print(f"secondary metric skipped: {e!r}", file=sys.stderr)
    finally:
        signal.alarm(0)
    signal.alarm(420)
    try:
        inter_encode_metric(CLIP)
    except Exception as e:
        print(f"inter secondary skipped: {e!r}", file=sys.stderr)
    finally:
        signal.alarm(0)
    signal.alarm(420)
    try:
        gop_scaling_metric()
    except Exception as e:
        print(f"scaling tertiary skipped: {e!r}", file=sys.stderr)
    finally:
        signal.alarm(0)


if __name__ == "__main__":
    main()
