#!/bin/bash
# One-shot on-chip measurement battery (tools/chip_checklist.md, automated).
# Run from /root/repo the moment `python -c "import jax; jax.devices()"`
# shows a TPU.  Writes everything to tools/chip_day_<ts>/.
set -u
cd "$(dirname "$0")/.."
TS=$(date +%Y%m%d_%H%M%S)
OUT="tools/chip_day_$TS"
mkdir -p "$OUT"
log() { echo "== $*" | tee -a "$OUT/summary.txt"; }

log "0. probe"
timeout 120 python -c "import jax; print(jax.devices())" \
    > "$OUT/devices.txt" 2>&1 || { log "NO TPU — aborting"; exit 1; }
cat "$OUT/devices.txt" | tee -a "$OUT/summary.txt"

log "1. Mosaic correctness (device kernels on real hardware)"
timeout 3600 python -m pytest tests/test_wavefront_kernel.py \
    tests/test_device_encode.py tests/test_device_inter.py \
    tests/test_decode.py tests/test_reconstruct_jax.py -x -q \
    2>&1 | tail -5 | tee -a "$OUT/summary.txt"

log "2. headline bench (G-sweep + encode secondaries + scaling)"
timeout 5400 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.stderr"
cat "$OUT/bench.json" | tee -a "$OUT/summary.txt"
tail -20 "$OUT/bench.stderr" | tee -a "$OUT/summary.txt"

log "3. decode step split"
timeout 1800 python tools/profile_decode.py \
    > "$OUT/profile_decode.txt" 2>&1
tail -8 "$OUT/profile_decode.txt" | tee -a "$OUT/summary.txt"

log "4. knob A/B (each: one bench headline run)"
for knobs in "ALFALFA_SPARSE_FETCH=0" "ALFALFA_DEVICE_REFS=0" \
             "ALFALFA_SIMD_TOKENS=0" "ALFALFA_BENCH_G=32"; do
  log "   $knobs"
  env $knobs timeout 3600 python bench.py \
      > "$OUT/bench_${knobs//=/_}.json" 2> "$OUT/bench_${knobs//=/_}.stderr"
  cat "$OUT/bench_${knobs//=/_}.json" | tee -a "$OUT/summary.txt"
done

log "5. Salsify 720p latency gate (device encode)"
ALFALFA_DEVICE_ENCODE=1 timeout 1800 python -m pytest \
    tests/test_salsify_latency.py -x -q 2>&1 | tail -3 \
    | tee -a "$OUT/summary.txt"

log "6. cold start (fresh process, persistent cache)"
/usr/bin/time -v timeout 1800 python -c "
from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.parallel.gop import BatchedGopDecoder
import time, jax
t0 = time.perf_counter()
ivf = IVFReader('tests/fixtures/inter_1280x720_q48.ivf')
dec = BatchedGopDecoder(ivf.width, ivf.height, 8)
(y, u, v), _ = dec.decode_frame_batch([ivf.frame(0)] * 8)
jax.block_until_ready(y)
print(f'first 720p frame: {time.perf_counter()-t0:.1f}s')
" > "$OUT/coldstart.txt" 2>&1
grep "first 720p" "$OUT/coldstart.txt" | tee -a "$OUT/summary.txt"

log "done — see $OUT/"
