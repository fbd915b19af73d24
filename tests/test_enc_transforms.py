"""Lane-wise encoder transforms (ops/enc_transforms_pallas.py) vs the
scalar numpy references — every primitive must be bit-exact, including
the stored-int16 intermediate wraps."""
import numpy as np
import jax.numpy as jnp
import pytest

from alfalfa_tpu.ops import enc_transforms_pallas as ET
from alfalfa_tpu.encoder import transforms_np as FX
from alfalfa_tpu.decoder import reconstruct_np as RNP

RNG = np.random.RandomState(7)
Rp, NB = 6, 16


def test_fdct():
    orig = RNG.randint(0, 256, (Rp, NB, 4, 4)).astype(np.uint8)
    pred = RNG.randint(0, 256, (Rp, NB, 4, 4)).astype(np.uint8)
    d = (orig.astype(np.int32) - pred.astype(np.int32)).reshape(Rp, NB * 16)
    got = np.asarray(ET.fdct(jnp.asarray(d)))
    want = np.stack([np.concatenate(
        [FX.subtract_fdct(orig[r, b], pred[r, b]) for b in range(NB)])
        for r in range(Rp)])
    assert (got == want).all()


def test_quantize_dequantize():
    co = RNG.randint(-3000, 3000, (Rp, NB * 16)).astype(np.int32)
    for dc, ac in ((4, 4), (9, 13), (132, 157)):
        qg = np.asarray(ET.quantize(jnp.asarray(co), dc, ac))
        wq = np.stack([np.concatenate(
            [FX.quantize(co[r, 16 * b:16 * b + 16].astype(np.int16), dc, ac)
             for b in range(NB)]) for r in range(Rp)])
        assert (qg == wq).all()
        dg = np.asarray(ET.dequantize(jnp.asarray(qg.astype(np.int32)),
                                      dc, ac))
        wd = np.stack([np.concatenate(
            [RNP.dequantize(wq[r, 16 * b:16 * b + 16], dc, ac)
             for b in range(NB)]) for r in range(Rp)])
        assert (dg == wd).all()


def test_idct():
    co = RNG.randint(-40, 40, (Rp, NB * 16)).astype(np.int32)
    got = np.asarray(ET.idct(jnp.asarray(co)))
    for r in range(Rp):
        for b in range(NB):
            t = np.full((4, 4), 128, np.uint8)
            RNP.idct_add(co[r, 16 * b:16 * b + 16].astype(np.int16), t)
            want = t.astype(np.int32).reshape(-1) - 128
            assert (got[r, 16 * b:16 * b + 16] == want).all()


def test_fwht_iwht():
    dc = RNG.randint(-2000, 2000, (Rp, 16)).astype(np.int32)
    fg = np.asarray(ET.fwht(jnp.asarray(dc)))
    fw = np.stack([FX.fwht(dc[r].astype(np.int16)) for r in range(Rp)])
    assert (fg == fw).all()
    ig = np.asarray(ET.iwht(jnp.asarray(fg)))
    wi = np.stack([RNP.iwht(fw[r].astype(np.int16)).reshape(-1)
                   for r in range(Rp)])
    assert (ig == wi).all()


def test_lf_pallas_vs_scan():
    """The Pallas loop-filter kernel against the lax.scan oracle on random
    planes (the end-to-end decode gates cover real streams; this covers
    dense random parameter/pixel space)."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("Pallas kernel needs the TPU backend")
    from alfalfa_tpu.decoder import reconstruct_jax as RJ
    from alfalfa_tpu.ops import lf_pallas

    R, C = 5, 9
    sched = RJ.skew_schedule(R, C)
    nd, Rpad = sched["n_diags"], sched["R_pad"]
    rng = np.random.RandomState(3)

    def mk(S):
        tiles = rng.randint(0, 256, (R, C, S * S)).astype(np.int16)
        return RJ._skew(jnp.asarray(tiles), sched["scat_idx"], nd, Rpad)

    Dy, Du, Dv = mk(16), mk(8), mk(8)
    level = rng.randint(0, 64, (R, C)).astype(np.int32)
    from alfalfa_tpu.ops.loopfilter import loopfilter_params
    p = loopfilter_params(level, 0, False)
    valid = jnp.asarray(sched["valid"])
    hr = jnp.asarray(sched["has_row"])
    hc = jnp.asarray(sched["has_col"])

    def sk(x):
        return RJ._skew(jnp.asarray(x), sched["scat_idx"], nd,
                        Rpad)[RJ.DPAD:]

    apply_f = valid & (sk(np.where(level > 0, p["level"], 0)) > 0)
    skip = rng.rand(R, C) < 0.3
    prm = jnp.stack(
        [apply_f.astype(jnp.int16), sk(p["interior"]).astype(jnp.int16),
         sk(p["mb_limit"]).astype(jnp.int16),
         sk(p["sb_limit"]).astype(jnp.int16),
         sk(p["hev"]).astype(jnp.int16),
         (apply_f & ~sk(skip)).astype(jnp.int16),
         (apply_f & hc).astype(jnp.int16),
         (apply_f & hr).astype(jnp.int16)], axis=-1)

    ys, us, vs = RJ._lf_scan(Dy, Du, Dv, prm, jnp.asarray(sched["d_idx"]),
                             Rpad)
    assert (np.asarray(lf_pallas.lf_pallas(Dy, prm, 16))
            == np.asarray(ys)).all()
    assert (np.asarray(lf_pallas.lf_pallas(Du, prm, 8))
            == np.asarray(us)).all()
    assert (np.asarray(lf_pallas.lf_pallas(Dv, prm, 8))
            == np.asarray(vs)).all()
