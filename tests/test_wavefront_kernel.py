"""Interpret-mode gate for the TPU batch decode path: the merged Pallas
wavefront (ops/wavefront_pallas.py, intra + lag-3 loop filter) must decode
real fixture frames bit-exactly vs the numpy oracle, off-TPU.

This is the only off-TPU coverage of reconstruct_core_batch — the per-GOP
BatchedGopDecoder takes the scan path on CPU — so it gates kernel-side
changes (e.g. the B_PRED band scan) that would otherwise only run on
real hardware."""
import numpy as np
import pytest

from alfalfa_tpu.util.ivf import IVFReader
from alfalfa_tpu.bitstream.header import UncompressedChunk
from alfalfa_tpu.decoder.parse import FrameParser
from alfalfa_tpu.decoder.decoder import Decoder
from alfalfa_tpu.decoder import reconstruct_np, reconstruct_jax as RJ


def _decode_frame_batch(path, frame_no, G=2):
    import jax.numpy as jnp
    ivf = IVFReader(path)
    dec = Decoder(ivf.width, ivf.height)
    for i in range(frame_no):
        dec.decode_frame(ivf.frame(i))
    refs = dec.references

    chunk = UncompressedChunk(ivf.frame(frame_no), ivf.width, ivf.height)
    header, arrays, _ = FrameParser(dec.state).parse(chunk)
    want = reconstruct_np.reconstruct(header, arrays, dec.state, refs,
                                      chunk.key_frame)

    R, C = arrays.mb_rows, arrays.mb_cols
    qf = RJ._frame_quant_factors(header, dec.state, arrays.segment)
    lfp = RJ._frame_lf_params(header, arrays, dec.state, chunk.key_frame)

    def rep(x):
        return np.broadcast_to(np.asarray(x)[None], (G,) + np.shape(x)).copy()

    ry = rep(np.stack([refs.last.y, refs.last.y, refs.golden.y,
                       refs.alternative.y]))
    ru = rep(np.stack([refs.last.u, refs.last.u, refs.golden.u,
                       refs.alternative.u]))
    rv = rep(np.stack([refs.last.v, refs.last.v, refs.golden.v,
                       refs.alternative.v]))
    y, u, v = RJ.reconstruct_core_batch(
        R, C, G, chunk.key_frame,
        jnp.asarray(rep(arrays.coeffs.astype(np.int32))),
        {k: jnp.asarray(rep(qa)) for k, qa in qf.items()},
        jnp.asarray(rep(arrays.y2_coded)),
        jnp.asarray(rep(arrays.has_nonzero)),
        jnp.asarray(rep(arrays.ymode.astype(np.int32))),
        jnp.asarray(rep(arrays.uvmode.astype(np.int32))),
        jnp.asarray(rep(arrays.bmode.astype(np.int32))),
        jnp.asarray(rep(arrays.ref.astype(np.int32))),
        jnp.asarray(rep(arrays.sub_mv.astype(np.int32))),
        jnp.asarray(rep(arrays.uv_mv.astype(np.int32))),
        jnp.asarray(ry), jnp.asarray(ru), jnp.asarray(rv),
        tuple(jnp.asarray(rep(x)) for x in lfp))
    return np.asarray(y), np.asarray(u), np.asarray(v), want, G


@pytest.mark.parametrize("path,frame_no", [
    ("tests/fixtures/kf_176x144_q16.ivf", 0),        # keyframe (B_PRED)
    ("tests/fixtures/inter_176x144_q96.ivf", 1),     # interframe
])
def test_wavefront_kernel_bit_exact(path, frame_no):
    y, u, v, want, G = _decode_frame_batch(path, frame_no)
    for g in range(G):
        np.testing.assert_array_equal(y[g], want.y, f"shard {g} Y")
        np.testing.assert_array_equal(u[g], want.u, f"shard {g} U")
        np.testing.assert_array_equal(v[g], want.v, f"shard {g} V")


@pytest.mark.parametrize("G", [16, 32])
def test_wavefront_kernel_wide_batch(G):
    """G=16/32: 2-4x the default GOP-lockstep width.  The kernel's step
    count is batch-independent (batch rides the sublane axis), so wide
    batches are the cheap chip-throughput lever — gate that the sublane
    folding stays bit-exact beyond the natural vreg width of 8."""
    y, u, v, want, G = _decode_frame_batch(
        "tests/fixtures/inter_176x144_q96.ivf", 1, G=G)
    for g in range(G):
        np.testing.assert_array_equal(y[g], want.y, f"shard {g} Y")
        np.testing.assert_array_equal(u[g], want.u, f"shard {g} U")
        np.testing.assert_array_equal(v[g], want.v, f"shard {g} V")
