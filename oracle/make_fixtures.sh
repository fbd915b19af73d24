#!/bin/bash
# Generate golden test fixtures with the oracle (reference) codec.
#
# Outputs into tests/fixtures/:
#   *.ivf            — committed bitstreams (oracle-encoded)
#   *.state          — committed encoder/decoder state files
#   manifest.json    — SHA-1 of decoded planar YUV per clip (ground truth)
#   tmp/*.yuv        — full decoded YUV (regenerable; gitignored)
set -euo pipefail
cd "$(dirname "$0")"
make -j"$(nproc)" >/dev/null
BIN=$PWD/build/bin
FIX=$PWD/../tests/fixtures
TMP=$FIX/tmp
mkdir -p "$TMP"
cd "$TMP"

gen() { python3 "$FIX/gen_inputs.py" "$@"; }

# ---- inputs ----
gen 64 48 1 kf_64x48.y4m 3
gen 176 144 1 kf_176x144.y4m 5
gen 176 144 12 clip_176x144.y4m 7
gen 320 240 8 clip_320x240.y4m 11
gen 1280 720 6 clip_1280x720.y4m 13

# ---- encodes ----
enc() { "$BIN/xc-enc" -i y4m "$@" >/dev/null 2>&1; }

enc -o "$FIX/kf_64x48_q40.ivf"        --y-ac-qi 40 kf_64x48.y4m
enc -o "$FIX/kf_176x144_q16.ivf"      --y-ac-qi 16 kf_176x144.y4m
enc -o "$FIX/inter_176x144_q32.ivf"   --y-ac-qi 32 clip_176x144.y4m
enc -o "$FIX/inter_176x144_q8.ivf"    --y-ac-qi 8  clip_176x144.y4m
enc -o "$FIX/inter_176x144_q96.ivf"   --y-ac-qi 96 clip_176x144.y4m
enc -o "$FIX/inter_320x240_q40.ivf"   --y-ac-qi 40 clip_320x240.y4m
enc -o "$FIX/inter_176x144_rt_q48.ivf" -q rt --y-ac-qi 48 clip_176x144.y4m
enc -o "$FIX/twopass_176x144_q32.ivf" --two-pass --y-ac-qi 32 clip_176x144.y4m
enc -o "$FIX/ssim80_176x144.ivf"      -s 0.80 clip_176x144.y4m
enc -o "$FIX/inter_1280x720_q48.ivf"  --y-ac-qi 48 clip_1280x720.y4m

# state fixture (for rebase / serdes tests): decoder state after frame 5
"$BIN/xc-dump" -f 5 "$FIX/inter_176x144_q32.ivf" "$FIX/dump_frame5.state"

# ---- golden decodes ----
export FIX BIN
python3 - <<'EOF'
import hashlib, json, os, subprocess, glob
fix = os.environ['FIX']; bin_ = os.environ['BIN']
manifest = {}
for ivf in sorted(glob.glob(os.path.join(fix, '*.ivf'))):
    name = os.path.basename(ivf)
    yuv = subprocess.run([os.path.join(bin_, 'decode-to-stdout'), ivf],
                         check=True, stdout=subprocess.PIPE).stdout
    with open(os.path.join(fix, 'tmp', name.replace('.ivf', '.yuv')), 'wb') as f:
        f.write(yuv)
    manifest[name] = {
        'yuv_sha1': hashlib.sha1(yuv).hexdigest(),
        'yuv_bytes': len(yuv),
    }
with open(os.path.join(fix, 'manifest.json'), 'w') as f:
    json.dump(manifest, f, indent=1, sort_keys=True)
print(json.dumps(manifest, indent=1, sort_keys=True))
EOF
