"""In-kernel trellis (RD-optimal) coefficient quantization for the encode
wavefront/raster Pallas kernels — the device half of the --two-pass
encoder's second pass (reference encoder/encoder.cc:220-408; host twin
encoder/trellis.py, bit-exact gated against it).

Layout: a batch of ``nb`` subblocks is processed per DP instance, in
POSITION-MAJOR lanes: lane = nb * zigzag_index + subblock.  The 16-step
2-level Viterbi runs backward over zigzag positions as a carry-only
``fori_loop`` (the only loop shape Mosaic lowers): per-position data
(the unquantized coefficient, the per-position token-cost row) rides
rolled lane windows, the DP node state (rate/dist/token per level) rides
the carry, and the per-position backtrack stores (coefficient, token,
next-pointer per level) accumulate in rolling output carries.  The
walk-forward is a second masked 16-step loop.

Everything is int32: the reference accumulates RD costs in int64 with
INF = 1<<62, but the real magnitudes are bounded — rate <= ~3.3e5
(16 positions x (max token cost ~12k + max value cost 8285)), rate_mult
<= 716 with dist_mult 1 (or rate_mult <= 1000 with dist_mult 100 and
then quantizer factors <= ~27 bound dist x 100 <= ~5e6), so every cost
fits in int32 with > 3x margin and no INF sentinel is needed (both
levels' costs are always computed; argmin replaces the running-min).

Entry contexts: the first token's cost depends on the up/left
POST-trellis nonzero flags.  Instances whose context is known when they
run (B_PRED subblocks inside the band loop, Y2, UV) charge it directly;
the whole-MB luma path runs one DP for all 16 subblocks in parallel,
computes final costs under ALL THREE contexts plus both start-level
walk-forwards, and resolves the per-subblock choice afterwards with a
16-step select chain (the context only ever affects which of the two
precomputed outputs is taken).
"""
import numpy as np
import jax
import jax.numpy as jnp

from alfalfa_tpu.bitstream import tables as T

EOB = 11           # DCT_EOB_TOKEN
_PC = T.VP8_PROB_COST
_C128, _C127 = int(_PC[128]), int(_PC[127])       # sign-bit costs
_C159, _C96 = int(_PC[159]), int(_PC[96])         # cat1 extra bit
# LSB-aligned extra-bit costs per category 2..6 (token 6..10); unused
# high bit positions cost 0 (the extra value never sets them)
_CAT_BASE = (7, 11, 19, 35, 67)
_A0 = np.zeros((5, 11), np.int32)
_A1 = np.zeros((5, 11), np.int32)
for _c, (_b, _probs) in enumerate(T.TOKEN_DECODERS):
    _n = len(_probs)
    for _j in range(_n):
        _p = int(_probs[_n - 1 - _j])
        _A0[_c, _j] = int(_PC[_p])
        _A1[_c, _j] = int(_PC[255 - _p])


def token_costs_pm(coeff_probs):
    """Host prep: (4, 16, 36) int32 position-major token costs.
    [bt, idx] = fill_token_costs(coeff_probs)[bt, COEFF_TO_BAND[idx]]
    flattened ctx-major (entry = ctx * 12 + token)."""
    from alfalfa_tpu.encoder.trellis import fill_token_costs
    tc = fill_token_costs(coeff_probs)                 # (4, 8, 3, 12) u32
    band = np.asarray(T.COEFF_TO_BAND, np.int64)
    return np.ascontiguousarray(
        tc[:, band].reshape(4, 16, 36).astype(np.int32))


def pm_perm(nb):
    """Natural block layout (lane = 16*b + raster_pos) -> position-major
    (lane = nb*zigzag_idx + b) permutation matrix pair (fwd, inv), bf16,
    for exact hi/lo-split MXU permutes of int16-range values."""
    n = 16 * nb
    P = np.zeros((n, n), np.float32)
    for idx in range(16):
        for b in range(nb):
            P[16 * b + int(T.ZIGZAG[idx]), nb * idx + b] = 1
    return jnp.asarray(P, jnp.bfloat16), jnp.asarray(P.T, jnp.bfloat16)


def permute_wide(x, P):
    """Exact lane permutation of int16-range int32 values via two bf16
    MXU matmuls (hi/lo byte split; arithmetic-shift hi so hi*256+lo == x
    for negatives too)."""
    hi = (x >> 8).astype(jnp.bfloat16)
    lo = (x & 255).astype(jnp.bfloat16)
    phi = jnp.dot(hi, P, preferred_element_type=jnp.float32)
    plo = jnp.dot(lo, P, preferred_element_type=jnp.float32)
    return phi.astype(jnp.int32) * 256 + plo.astype(jnp.int32)


def _rdcost(rate, dist, rmult, dmult):
    return ((128 + rate * rmult) >> 8) + dist * dmult


def _trunc_div(a, f):
    """Exact a // f for a >= 0 via f32 reciprocal + correction (the
    quantize() pattern; |a| <= ~33k, f <= ~450, one step suffices)."""
    q = (a.astype(jnp.float32) *
         (1.0 / jnp.asarray(f, jnp.float32))).astype(jnp.int32)
    q = jnp.where((q + 1) * f <= a, q + 1, q)
    q = jnp.where(q * f > a, q - 1, q)
    return q


def _token_of(mag):
    """token_for_coeff on magnitudes (encoder/costs.cc:242-261)."""
    w = jnp.where
    return w(mag <= 4, mag,
             w(mag <= 6, 5,
               w(mag <= 10, 6,
                 w(mag <= 18, 7,
                   w(mag <= 34, 8, w(mag <= 66, 9, 10))))))


def _cat_const(tok, vals):
    """Select a per-category constant by token (6..10 -> vals[0..4]),
    0 for non-category tokens."""
    w = jnp.where
    return w(tok == 6, int(vals[0]),
             w(tok == 7, int(vals[1]),
               w(tok == 8, int(vals[2]),
                 w(tok == 9, int(vals[3]),
                   w(tok == 10, int(vals[4]), 0)))))


def value_cost(cand, mag, tok):
    """Sign + category-extra-bits cost (trellis._build_value_cost),
    computed arithmetically from the magnitude/token."""
    cost = jnp.where(cand < 0, _C127, _C128)
    cost = cost + jnp.where(tok == 5,
                            jnp.where(mag == 6, _C96, _C159), 0)
    base = _cat_const(tok, _CAT_BASE)
    extra = mag - base
    for j in range(11):
        a0 = _cat_const(tok, _A0[:, j])
        a1 = _cat_const(tok, _A1[:, j])
        bit = (extra >> j) & 1
        cost = cost + jnp.where(bit == 1, a1, a0)
    return jnp.where(mag == 0, 0, cost)


def _lookup36(tc_ref, row_i, idx36):
    """Per-lane lookup of row ``row_i`` of the SMEM token-cost table.
    tc_ref: SMEM (64, 36) int32; row_i: scalar (may be traced);
    idx36: (Rp, nb) in [0, 36).

    Dynamic scalar SMEM reads + scalar->vector splats are the only
    Mosaic-lowerable shape for this: a VMEM (1, 36) row would need a
    (1, 1) -> (Rp, nb) sublane+lane vector broadcast per entry, which
    v5e libtpu rejects ("Broadcast in both sublanes and lanes") —
    caught on real hardware, invisible to offline cross-lowering."""
    res = jnp.zeros(idx36.shape, jnp.int32)
    for t in range(36):
        res = jnp.where(idx36 == t, tc_ref[row_i, t], res)
    return res


def _roll_right(x, n):
    return jnp.concatenate([x[:, -n:], x[:, :-n]], axis=1)


def trellis_nodes(unq_pm, tc_ref, base, first_index, dcf, acf, rmult,
                  dmult, nb):
    """Backward 2-level Viterbi (encoder/trellis.py trellis_quantize DP).

    unq_pm: (Rp, 16*nb) int32 position-major unquantized coefficients.
    tc_ref: SMEM (64, 36) int32 token-cost table; base: static row
    offset of this block type's 16 rows (0/16/32/48).
    first_index: 0 or 1 (static).  dcf/acf/rmult/dmult: traced scalars.

    Returns (final, stores):
      final  = (rate, dist, token) x2 levels, each (Rp, nb) — the
               node at first_index, BEFORE the entry-context charge;
      stores = (coeff, token, nxt) x2 levels, each (Rp, 16*nb) with
               slot j = zigzag index (15 - j)  [reversed position-major].
    """
    Rp = unq_pm.shape[0]
    shape = (Rp, nb)
    z = jnp.zeros(shape, jnp.int32)

    cl = z  # coded_length per subblock
    for idx in range(first_index, 16):
        nzm = unq_pm[:, idx * nb:(idx + 1) * nb] != 0
        cl = jnp.where(nzm, idx + 1, cl)

    init_tok = z + EOB
    stores0 = jnp.zeros((Rp, 16 * nb), jnp.int32)
    init_store_t = jnp.zeros((Rp, 16 * nb), jnp.int32) + EOB
    init_store_n = jnp.zeros((Rp, 16 * nb), jnp.int32) + 255

    def body(t, carry):
        (rate0, dist0, tok0, rate1, dist1, tok1, unq_roll,
         sc0, st0, sn0, sc1, st1, sn1) = carry
        idx = 15 - t
        o = unq_roll[:, 15 * nb:]
        factor = jnp.where(idx == 0, dcf, acf)
        ao = jnp.abs(o)
        qmag = _trunc_div(ao, factor)
        sgn = jnp.where(o < 0, -1, 1)
        active = (idx < cl) & (idx >= first_index)
        # row at idx+1, clamped (garbage at idx=15, masked below)
        row_next = base + jnp.minimum(idx + 1, 15)

        def node_for(shift):
            mag = jnp.maximum(qmag - shift, 0)
            cand = sgn * mag
            diff = o - cand * factor
            sse = diff * diff
            tok = _token_of(mag)
            cls = jnp.minimum(mag, 2)
            rd = []
            for rn, dn, tn in ((rate0, dist0, tok0), (rate1, dist1, tok1)):
                d_ = dn + sse
                add = jnp.where(idx < 15,
                                _lookup36(tc_ref, row_next,
                                          cls * 12 + tn), 0)
                r_ = rn + add
                rd.append((r_, d_, _rdcost(r_, d_, rmult, dmult)))
            b1 = rd[1][2] < rd[0][2]
            rb = jnp.where(b1, rd[1][0], rd[0][0])
            db = jnp.where(b1, rd[1][1], rd[0][1])
            tnb = jnp.where(b1, tok1, tok0)
            nxt = b1.astype(jnp.int32)
            pull = (mag == 0) & (tnb == EOB)
            return (jnp.where(pull, 0, rb + value_cost(cand, mag, tok)),
                    jnp.where(pull, sse, db),
                    jnp.where(pull, EOB, tok),
                    jnp.where(pull, 255, nxt),
                    jnp.where(pull, 0, cand))

        n0 = node_for(0)
        n1 = node_for(1)
        # q == 0 and shift != 0: level 1 copies level 0's node
        q0 = qmag == 0
        n1 = tuple(jnp.where(q0, a, b) for a, b in zip(n0, n1))

        new0 = (jnp.where(active, n0[0], rate0),
                jnp.where(active, n0[1], dist0),
                jnp.where(active, n0[2], tok0))
        new1 = (jnp.where(active, n1[0], rate1),
                jnp.where(active, n1[1], dist1),
                jnp.where(active, n1[2], tok1))

        def push(store, val, init):
            return jnp.concatenate(
                [store[:, nb:], jnp.where(active, val, init)], axis=1)

        return (new0[0], new0[1], new0[2], new1[0], new1[1], new1[2],
                _roll_right(unq_roll, nb),
                push(sc0, n0[4], 0), push(st0, n0[2], EOB),
                push(sn0, n0[3], 255),
                push(sc1, n1[4], 0), push(st1, n1[2], EOB),
                push(sn1, n1[3], 255))

    out = jax.lax.fori_loop(0, 16, body, (
        z, z, init_tok, z, z, init_tok, unq_pm,
        stores0, init_store_t, init_store_n,
        stores0, init_store_t, init_store_n))
    final = (out[0], out[1], out[2], out[3], out[4], out[5])
    stores = out[7:13]
    return final, stores


def final_costs(final, tc_ref, row_i, ctx, rmult, dmult):
    """Charge the first token's cost under entry context ``ctx`` and
    return (cost_level0, cost_level1).  row_i: the SMEM table row index
    at first_index (base + first_index); ctx: (Rp, nb) in {0, 1, 2}."""
    rate0, dist0, tok0, rate1, dist1, tok1 = final
    c0 = _rdcost(rate0 + _lookup36(tc_ref, row_i, ctx * 12 + tok0), dist0,
                 rmult, dmult)
    c1 = _rdcost(rate1 + _lookup36(tc_ref, row_i, ctx * 12 + tok1), dist1,
                 rmult, dmult)
    return c0, c1


def choose_level(final, tc_ref, row_i, ctx, rmult, dmult):
    """Start-level argmin under a known entry context (ties -> level 0,
    matching np.argmin)."""
    c0, c1 = final_costs(final, tc_ref, row_i, ctx, rmult, dmult)
    return (c1 < c0).astype(jnp.int32)


def trellis_walk(stores, choice, first_index, nb):
    """Walk the chosen path forward, emitting quantized coefficients.

    stores: the reversed position-major stores from trellis_nodes.
    choice: (Rp, nb) start level in {0, 1}.
    Returns (out_pm (Rp, 16*nb) position-major slot j = zigzag index j,
             nz (Rp, nb) bool)."""
    sc0, st0, sn0, sc1, st1, sn1 = stores
    Rp = sc0.shape[0]
    out0 = jnp.zeros((Rp, 16 * nb), jnp.int32)
    # active/nz ride the carry as int32: Mosaic cannot legalize an
    # scf.for whose carry holds i1 vectors (hardware-only failure,
    # invisible to interpret mode and offline cross-lowering)
    nz0 = jnp.zeros((Rp, nb), jnp.int32)
    act0 = jnp.ones((Rp, nb), jnp.int32)

    def body(idx, carry):
        active, ch, out, nz, rc0, rt0, rn0, rc1, rt1, rn1 = carry
        w = lambda s: s[:, 15 * nb:]
        is1 = ch == 1
        tok = jnp.where(is1, w(rt1), w(rt0))
        cf = jnp.where(is1, w(rc1), w(rc0))
        nx = jnp.where(is1, w(rn1), w(rn0))
        stepped = idx >= first_index      # traced scalar bool
        live = (active != 0) & (tok != EOB)
        emit = jnp.where(stepped, jnp.where(live, cf, 0), 0)
        out = jnp.concatenate([out[:, nb:], emit], axis=1)
        nz = nz | (emit != 0).astype(jnp.int32)
        ch = jnp.where(stepped, jnp.where(live, nx, ch), ch)
        active = jnp.where(stepped, live.astype(jnp.int32), active)
        return (active, ch, out, nz,
                _roll_right(rc0, nb), _roll_right(rt0, nb),
                _roll_right(rn0, nb), _roll_right(rc1, nb),
                _roll_right(rt1, nb), _roll_right(rn1, nb))

    res = jax.lax.fori_loop(0, 16, body, (
        act0, choice, out0, nz0, sc0, st0, sn0, sc1, st1, sn1))
    return res[2], res[3] != 0


def trellis_quantize_pm(unq_pm, tc_ref, base, first_index, ctx, dcf, acf,
                        rmult, dmult, nb):
    """Known-context convenience: DP + level choice + walk-forward.
    Returns (out_pm, nz)."""
    final, stores = trellis_nodes(unq_pm, tc_ref, base, first_index,
                                  dcf, acf, rmult, dmult, nb)
    choice = choose_level(final, tc_ref, base + first_index, ctx,
                          rmult, dmult)
    return trellis_walk(stores, choice, first_index, nb)
