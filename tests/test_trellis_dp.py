"""Parity gate: the in-kernel trellis DP (ops/trellis_pallas.py) is
bit-exact to the host trellis quantizer (encoder/trellis.py) that the
RD-curve and roundtrip gates validate, over randomized coefficients,
real quantizer factors, both first_index values and all entry contexts.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alfalfa_tpu.bitstream import tables as T
from alfalfa_tpu.encoder.costs import rd_multipliers
from alfalfa_tpu.encoder.trellis import fill_token_costs, trellis_quantize
from alfalfa_tpu.ops import trellis_pallas as TP


def _host_probs(seed=0):
    rng = np.random.default_rng(seed)
    # default probs jittered into a realistic frame table
    base = np.asarray(T.DEFAULT_COEFF_PROBS, np.int32)
    jit = rng.integers(-30, 30, base.shape)
    return np.clip(base + jit, 1, 255).astype(np.uint8)


def _to_pm(blocks, nb):
    """(nb, 16) natural-order -> (1, 16*nb) position-major."""
    out = np.zeros((1, 16 * nb), np.int32)
    for b in range(nb):
        for idx in range(16):
            out[0, nb * idx + b] = blocks[b, int(T.ZIGZAG[idx])]
    return out


def _from_pm(out_pm, nb):
    """(1, 16*nb) position-major -> (nb, 16) natural order."""
    res = np.zeros((nb, 16), np.int32)
    for b in range(nb):
        for idx in range(16):
            res[b, int(T.ZIGZAG[idx])] = out_pm[0, nb * idx + b]
    return res


@functools.lru_cache(maxsize=None)
def _jit_quantize(first_index, nb, base):
    return jax.jit(functools.partial(
        TP.trellis_quantize_pm, base=base, first_index=first_index, nb=nb))


def _gen_blocks(rng, n):
    """Coefficient blocks stressing every trellis branch."""
    rows = []
    for i in range(n):
        kind = i % 6
        if kind == 0:
            b = rng.integers(-80, 80, 16)          # mid energy
        elif kind == 1:
            b = np.zeros(16, np.int64)             # all zero
        elif kind == 2:
            b = rng.integers(-8, 8, 16)            # quantizes to ~0 (EOB pulls)
        elif kind == 3:
            b = rng.integers(-2000, 2000, 16)      # big categories
            b[rng.random(16) < 0.5] = 0
        elif kind == 4:
            b = np.zeros(16, np.int64)
            b[0] = rng.integers(-300, 300)         # DC only
        else:
            b = rng.integers(-400, 400, 16)
            b[rng.random(16) < 0.7] = 0            # sparse
        rows.append(b)
    return np.array(rows, np.int32)


@pytest.mark.parametrize("q_ac", [8, 44, 92, 160])
@pytest.mark.parametrize("first_index", [0, 1])
def test_dp_matches_host(q_ac, first_index):
    rng = np.random.default_rng(q_ac * 7 + first_index)
    probs = _host_probs(q_ac)
    tc = fill_token_costs(probs)
    tcpm = TP.token_costs_pm(probs)
    rmult, dmult = rd_multipliers(q_ac)
    dcf, acf = max(4, q_ac - 4), q_ac

    for bt in range(4):
        nb = 8
        blocks = _gen_blocks(rng, nb)
        if first_index:
            blocks[:, 0] = 0
        unq_pm = jnp.asarray(_to_pm(blocks, nb))
        tc_val = jnp.asarray(tcpm.reshape(64, 36))
        for ctx in (0, 1, 2):
            out_pm, nz = _jit_quantize(first_index, nb, 16 * bt)(
                unq_pm, tc_val, ctx=jnp.full((1, nb), ctx),
                dcf=dcf, acf=acf, rmult=rmult, dmult=dmult)
            got = _from_pm(np.asarray(out_pm), nb)
            got_nz = np.asarray(nz)[0]
            for b in range(nb):
                want = trellis_quantize(
                    blocks[b].astype(np.int32), dcf, acf, tc[bt], ctx,
                    first_index, rmult, dmult)
                assert np.array_equal(got[b], want), (
                    f"bt={bt} b={b} ctx={ctx}\n{got[b]}\n{want}")
                assert bool(got_nz[b]) == bool(want.any())


def test_deferred_context_resolution():
    """The 3-context cost precompute + both walk-forwards reproduce the
    known-context path for every context."""
    rng = np.random.default_rng(11)
    probs = _host_probs(3)
    tcpm = TP.token_costs_pm(probs)
    rmult, dmult = rd_multipliers(60)
    dcf, acf = 56, 60
    nb = 8
    blocks = _gen_blocks(rng, nb)
    unq_pm = jnp.asarray(_to_pm(blocks, nb))
    tc_val = jnp.asarray(tcpm.reshape(64, 36))

    final, stores = TP.trellis_nodes(unq_pm, tc_val, 0, 0, dcf, acf,
                                     rmult, dmult, nb)
    outs = [TP.trellis_walk(stores, jnp.full((1, nb), l), 0, nb)
            for l in (0, 1)]
    for ctx in (0, 1, 2):
        choice = TP.choose_level(final, tc_val, 0,
                                 jnp.full((1, nb), ctx), rmult, dmult)
        ref_out, ref_nz = _jit_quantize(0, nb, 0)(
            unq_pm, tc_val, ctx=jnp.full((1, nb), ctx),
            dcf=dcf, acf=acf, rmult=rmult, dmult=dmult)
        sel = np.asarray(choice)[0]
        for b in range(nb):
            pick = outs[int(sel[b])]
            assert np.array_equal(
                np.asarray(pick[0])[0, b::nb], np.asarray(ref_out)[0, b::nb])
            assert np.asarray(pick[1])[0, b] == np.asarray(ref_nz)[0, b]


def test_pm_permute_roundtrip():
    rng = np.random.default_rng(5)
    for nb in (1, 8, 16):
        fwd, inv = TP.pm_perm(nb)
        x = jnp.asarray(rng.integers(-32768, 32768, (3, 16 * nb)), jnp.int32)
        pm = TP.permute_wide(x, fwd)
        back = TP.permute_wide(pm, inv)
        assert np.array_equal(np.asarray(back), np.asarray(x))
        # spot-check the layout: natural lane 16*b+zz[idx] -> nb*idx+b
        xn = np.asarray(x)
        pmn = np.asarray(pm)
        for idx in (0, 5, 15):
            for b in (0, nb - 1):
                assert pmn[1, nb * idx + b] == xn[1, 16 * b + int(T.ZIGZAG[idx])]
