"""Cross-platform TPU lowering gate: every Pallas kernel must lower to
Mosaic without a TPU attached (jax.export with platforms=["tpu"]).

This catches Mosaic-only restrictions that interpret mode hides — e.g.
in-kernel lax.scan is only supported in fori_loop shape with no
extensive inputs (jax/_src/pallas/mosaic/lowering.py
_scan_lowering_rule) — and keeps the per-geometry lowering cost visible
(it was minutes with the unrolled B_PRED chains; the band fori_loops
brought it to seconds)."""
import jax
import jax.numpy as jnp
import pytest

R, C = 9, 11     # QCIF geometry keeps the gate fast


def _export(fn, *avals):
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*avals)


def test_wavefront_kernel_lowers():
    from alfalfa_tpu.ops import wavefront_pallas as WP
    GRp = 2 * 16
    nd = 2 * (R - 1) + C
    z = lambda p: jax.ShapeDtypeStruct((nd, GRp, p), jnp.int16)
    _export(lambda *a: WP.wavefront_frame_batch(*a, interpret=False),
            z(256), z(64), z(64), z(32), z(256), z(256), z(64), z(64),
            z(8))


def test_wavefront_pm_kernel_lowers():
    """The pixel-major wavefront (ops/wavefront_pm.py, the default batch
    decode kernel) must cross-lower: pixel index on sublanes, storage
    rows on lanes."""
    from alfalfa_tpu.ops import wavefront_pm as WPM
    L = 2 * 16
    nd = 2 * (R - 1) + C
    z = lambda p: jax.ShapeDtypeStruct((nd, p, L), jnp.int16)
    z2 = lambda p: jax.ShapeDtypeStruct((nd, p, 2 * L), jnp.int16)
    _export(lambda *a: WPM.wavefront_frame_batch_pm(*a, interpret=False),
            z(256), z2(64), z(32), z(256), z(256), z2(64), z(8))


def test_kf_encode_kernel_lowers():
    from alfalfa_tpu.encoder import encode_intra_device as EID
    kf = EID._kf_fn(R, C, False)
    z = jax.ShapeDtypeStruct
    _export(kf,
            z((R, C, 256), jnp.uint8), z((R, C, 64), jnp.uint8),
            z((R, C, 64), jnp.uint8),
            z((1, 8), jnp.int32), z((1, 8), jnp.int32),
            z((100, 10), jnp.bfloat16), z((100, 10), jnp.bfloat16))


@pytest.mark.parametrize("realtime,trellis", [(True, False), (False, False),
                                              (False, True)])
def test_inter_encode_kernel_lowers(realtime, trellis):
    from alfalfa_tpu.encoder.encode_inter_device import _inter_raw
    from alfalfa_tpu.ops.sixtap_pallas import pad_refs, pack_refs32
    H, W = R * 16, C * 16
    ry = pack_refs32(pad_refs(jnp.zeros((H, W), jnp.uint8)))
    ru = pack_refs32(pad_refs(jnp.zeros((H // 2, W // 2), jnp.uint8)))
    f = _inter_raw(R, C, realtime, False, trellis=trellis)
    z = jax.ShapeDtypeStruct
    extra = (z((64, 36), jnp.int32),) if trellis else ()
    _export(f,
            z((R, C, 256), jnp.uint8),
            z((R, C, 64), jnp.uint8), z((R, C, 64), jnp.uint8),
            z(ry.shape, jnp.int32), z(ru.shape, jnp.int32),
            z(ru.shape, jnp.int32),
            z((16,), jnp.int32), z((8,), jnp.int32), z((16,), jnp.int32),
            z((6, 4), jnp.int32), z((256,), jnp.int32),
            z((256,), jnp.int32), z((4, 1024), jnp.int32), *extra)


def test_fast_inter_kernel_lowers():
    """The fast rt path (decisions-only kernel + dense batched math,
    encoder/encode_inter_fast.py) must cross-lower at QCIF and the 720p
    bench geometry."""
    from alfalfa_tpu.encoder.encode_inter_fast import _fast_raw
    from alfalfa_tpu.ops.sixtap_pallas import pad_refs, pack_refs32
    z = jax.ShapeDtypeStruct
    for r_, c_ in ((R, C), (45, 80)):
        h, w = r_ * 16, c_ * 16
        ry = pack_refs32(pad_refs(jnp.zeros((h, w), jnp.uint8)))
        ru = pack_refs32(pad_refs(jnp.zeros((h // 2, w // 2), jnp.uint8)))
        f = _fast_raw(r_, c_, False, False)
        _export(f,
                z((r_, c_, 256), jnp.uint8),
                z((r_, c_, 64), jnp.uint8), z((r_, c_, 64), jnp.uint8),
                z(ry.shape, jnp.int32), z(ru.shape, jnp.int32),
                z(ru.shape, jnp.int32),
                z((16,), jnp.int32), z((8,), jnp.int32),
                z((16,), jnp.int32), z((6, 4), jnp.int32),
                z((256,), jnp.int32), z((256,), jnp.int32),
                z((4, 1024), jnp.int32))


def test_lf_pack_lowers(monkeypatch):
    """The encoder's device-reference path (loop-filter the recon tiles at
    the searched level + pad/pack into the MC layout) must cross-lower
    for TPU with the real (non-interpret) lf_pallas kernel inside."""
    from alfalfa_tpu.encoder.encode_inter_device import _lf_pack_fn
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    f = _lf_pack_fn(R, C, False)
    z = jax.ShapeDtypeStruct
    lfp = tuple(z((R, C), jnp.int32) for _ in range(5)) + (z((R, C), bool),)
    _export(lambda a, b, c, *p: f(a, b, c, p),
            z((R, C, 256), jnp.uint8), z((R, C, 64), jnp.uint8),
            z((R, C, 64), jnp.uint8), *lfp)


def test_full_decode_step_lowers(monkeypatch):
    """The complete BatchedGopDecoder TPU step — compact-stream scatter,
    packed-reference Pallas MC, merged wavefront, reference
    copy/refresh — must cross-lower for TPU end to end.  The backend is
    faked as 'tpu' so every on_tpu branch (including the Pallas MC and
    non-interpret wavefront) is the one exported."""
    import numpy as np
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.parallel.gop import BatchedGopDecoder

    ivf = IVFReader("tests/fixtures/inter_176x144_q96.ivf")
    payloads = [ivf.frame(0), ivf.frame(1)]
    G = 2

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    dec_tpu = BatchedGopDecoder(ivf.width, ivf.height, G)

    for key_frame_payload in (False, True):
        kf, batch, _flags, _show = dec_tpu.parse_frame_batch(
            [payloads[0 if key_frame_payload else 1]] * G)
        step = dec_tpu._step(kf, on_tpu=True)
        aval = lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                              np.asarray(x).dtype)
        batch_avals = {k: (None if v is None else aval(v))
                       for k, v in batch.items()}
        refs_avals = jax.tree.map(aval, dec_tpu.refs)
        jax.export.export(step, platforms=["tpu"])(batch_avals, refs_avals)


def test_kf_trellis_kernel_lowers():
    """The --two-pass trellis variant (nested DP fori_loops inside the
    band loop, rolled-carry walk-forwards, select-chain lookups) must
    lower to Mosaic."""
    from alfalfa_tpu.encoder import encode_intra_device as EID
    kf = EID._kf_fn(R, C, False, trellis=True)
    z = jax.ShapeDtypeStruct
    _export(kf,
            z((R, C, 256), jnp.uint8), z((R, C, 64), jnp.uint8),
            z((R, C, 64), jnp.uint8),
            z((1, 8), jnp.int32), z((1, 8), jnp.int32),
            z((100, 10), jnp.bfloat16), z((100, 10), jnp.bfloat16),
            z((64, 36), jnp.int32))


@pytest.mark.slow
@pytest.mark.parametrize("G", [8, 16, 32])
def test_wavefront_kernel_lowers_bench_geometry(G):
    """The exact 720p bench geometries (R=45, C=80, the bench.py G-sweep
    widths) must cross-lower for TPU — the r3 G-sweep died on chip with a
    Mosaic dynamic-sublane failure the QCIF gate could not see (VERDICT r3
    item 1b).  jax.export does not run the Mosaic backend compile, but it
    does pin the trace-level kernel shape; the backend-compile gate is the
    bench itself (bit_exact) plus tools/probe_dynrow.py on hardware."""
    from alfalfa_tpu.ops import wavefront_pallas as WP
    from alfalfa_tpu.ops import wavefront_pm as WPM
    Rb, Cb = 45, 80
    Rp = 48
    # reconstruct_core_batch folds at most ~1024 sublanes per invocation
    gs = min(G, max(1, 1024 // Rp))
    GRp = gs * Rp
    nd = 2 * (Rb - 1) + Cb
    z = lambda p: jax.ShapeDtypeStruct((nd, GRp, p), jnp.int16)
    _export(lambda *a: WP.wavefront_frame_batch(*a, interpret=False),
            z(256), z(64), z(64), z(32), z(256), z(256), z(64), z(64),
            z(8))
    zp = lambda p: jax.ShapeDtypeStruct((nd, p, GRp), jnp.int16)
    zp2 = lambda p: jax.ShapeDtypeStruct((nd, p, 2 * GRp), jnp.int16)
    _export(lambda *a: WPM.wavefront_frame_batch_pm(*a, interpret=False),
            zp(256), zp2(64), zp(32), zp(256), zp(256), zp2(64), zp(8))


@pytest.mark.slow
def test_full_decode_step_lowers_720p(monkeypatch):
    """End-to-end BatchedGopDecoder TPU step at the bench geometry
    (1280x720, G=8): compact-stream scatter, packed-ref Pallas MC, merged
    wavefront, reference refresh — all must cross-lower."""
    import numpy as np
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.parallel.gop import BatchedGopDecoder

    ivf = IVFReader("tests/fixtures/inter_1280x720_q48.ivf")
    G = 8
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    dec = BatchedGopDecoder(ivf.width, ivf.height, G)
    from alfalfa_tpu.parallel.gop import _upload_merged, _scatter_fn
    R, C = dec.mb_rows, dec.mb_cols
    for fno in (0, 1):
        kf, batch, _flags, _show = dec.parse_frame_batch(
            [ivf.frame(fno)] * G)
        dev, dev_r, spec_r, spec_c = _upload_merged(batch)
        step = dec._step(kf, on_tpu=True, spec=spec_r)
        aval = lambda x: jax.ShapeDtypeStruct(np.shape(x),
                                              np.asarray(x).dtype)
        refs_avals = jax.tree.map(aval, dec.refs)
        coeffs_aval = jax.ShapeDtypeStruct((G, R, C, 25, 16), jnp.int16)
        jax.export.export(jax.jit(lambda m: _scatter_fn(G, R, C, spec_c)(m)),
                          platforms=["tpu"])(aval(dev))
        jax.export.export(step, platforms=["tpu"])(
            aval(dev_r), coeffs_aval, refs_avals)
