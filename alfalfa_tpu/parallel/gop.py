"""GOP-parallel decoding/encoding over a device mesh (ExCamera-style).

The reference scales by making chunks of video independently processable
(state files + rebase; SURVEY.md sections 2.9, 3.3).  Here the same idea is
expressed natively in JAX: a batch of frames (one GOP chunk per device) is
sharded along a ``gop`` mesh axis with shard_map; each device reconstructs
its chunk locally, and the small exit state (reference planes, stats) is
exchanged with XLA collectives over ICI.
"""
from functools import partial
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from alfalfa_tpu.decoder.reconstruct_jax import reconstruct_core, skew_schedule


def make_gop_mesh(devices=None, axis="gop"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def gop_decode_step(mesh, mb_rows, mb_cols, key_frame=False, axis="gop"):
    """Builds a jitted sharded step: a batch of per-frame parse arrays
    (leading axis = frames, sharded over the mesh) is reconstructed in
    parallel; outputs are the per-frame rasters plus an all-gathered stack
    of exit luma planes (the data a rebase pass would consume).
    """
    sched = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
             for k, v in skew_schedule(mb_rows, mb_cols).items()}

    def per_frame(coeffs, qf, y2c, nz, ym, uvm, bm, refsel, smv, uvmv,
                  ry, ru, rv, lfp):
        return reconstruct_core(mb_rows, mb_cols, key_frame,
                                coeffs, qf, y2c, nz, ym, uvm, bm, refsel,
                                smv, uvmv, ry, ru, rv, lfp, sched)

    def shard_fn(coeffs, qf, y2c, nz, ym, uvm, bm, refsel, smv, uvmv,
                 ry, ru, rv, lfp):
        # each shard holds a sub-batch of frames; decode them with vmap
        y, u, v = jax.vmap(per_frame)(coeffs, qf, y2c, nz, ym, uvm, bm,
                                      refsel, smv, uvmv, ry, ru, rv, lfp)
        # exchange exit state: every device sees every chunk's final luma
        # plane (what the serial rebase pass consumes)
        exit_y = jax.lax.all_gather(y[-1], axis)
        exit_y = exit_y.reshape((-1,) + y.shape[1:])
        mean_energy = jax.lax.pmean(jnp.mean(jnp.abs(y.astype(jnp.float32))), axis)
        return y, u, v, exit_y, mean_energy

    spec = P(axis)
    fn = jax.shard_map(shard_fn, mesh=mesh, check_vma=False,
                       in_specs=(spec,) * 14,
                       out_specs=(spec, spec, spec, P(None), P()))
    return jax.jit(fn)


def example_frame_batch(n_frames, mb_rows, mb_cols, seed=0):
    """Synthesizes a valid batch of parse arrays for dry runs/benchmarks."""
    rng = np.random.RandomState(seed)
    R, C, B = mb_rows, mb_cols, n_frames
    coeffs = rng.randint(-80, 80, (B, R, C, 25, 16)).astype(np.int32)
    qf = {k: np.full((B, R, C), v, np.int32)
          for k, v in (("y_dc", 8), ("y_ac", 6), ("y2_dc", 16),
                       ("y2_ac", 9), ("uv_dc", 8), ("uv_ac", 6))}
    y2c = rng.rand(B, R, C) < 0.7
    nz = np.ones((B, R, C), bool)
    ym = np.where(y2c, 0, 4).astype(np.int32)   # DC_PRED / B_PRED mix
    uvm = rng.randint(0, 4, (B, R, C)).astype(np.int32)
    bm = rng.randint(0, 10, (B, R, C, 4, 4)).astype(np.int32)
    refsel = rng.randint(1, 4, (B, R, C)).astype(np.int32)
    smv = rng.randint(-64, 64, (B, R, C, 4, 4, 2)).astype(np.int32)
    uvmv = rng.randint(-64, 64, (B, R, C, 2, 2, 2)).astype(np.int32)
    H, W = R * 16, C * 16
    ry = rng.randint(0, 256, (B, 4, H, W)).astype(np.uint8)
    ru = rng.randint(0, 256, (B, 4, H // 2, W // 2)).astype(np.uint8)
    rv = rng.randint(0, 256, (B, 4, H // 2, W // 2)).astype(np.uint8)
    lvl = np.full((B, R, C), 20, np.int32)
    lfp = (lvl, np.full((B, R, C), 9, np.int32), np.full((B, R, C), 53, np.int32),
           np.full((B, R, C), 49, np.int32), np.full((B, R, C), 2, np.int32),
           np.zeros((B, R, C), bool))
    return (coeffs, qf, y2c, nz, ym, uvm, bm, refsel, smv, uvmv,
            ry, ru, rv, lfp)


def gop_encode_step(mesh, mb_rows, mb_cols, n_chunks, axis="gop", seed=0):
    """Multi-chip GOP-parallel keyframe ENCODE dry run: one chunk's first
    frame per device through the wavefront encode kernel
    (ops/enc_intra_pallas.py), exit reconstructions all-gathered over ICI
    (the data a pipelined rebase pass consumes; reencode.cc:305-381).
    Runs the kernel in interpret mode off-TPU so the virtual CPU mesh can
    execute it.  Returns (exit_y (n, H, W) u8, coeffs (n, R, C, 400))."""
    from alfalfa_tpu.encoder import encode_intra_device as EID
    from alfalfa_tpu.encoder.costs import rd_multipliers, Costs
    from alfalfa_tpu.bitstream.header import QuantIndices

    R, C = mb_rows, mb_cols
    H, W = R * 16, C * 16
    rng = np.random.RandomState(seed)
    oy = rng.randint(0, 256, (n_chunks, H, W)).astype(np.uint8)
    ou = rng.randint(0, 256, (n_chunks, H // 2, W // 2)).astype(np.uint8)
    ov = rng.randint(0, 256, (n_chunks, H // 2, W // 2)).astype(np.uint8)

    q = {k: int(v) for k, v in
         QuantIndices(y_ac_qi=48).quantizer().items()}
    rm, dm = rd_multipliers(q["y_ac"])
    scalars = jnp.asarray([[q["y_dc"], q["y_ac"], q["y2_dc"], q["y2_ac"],
                            q["uv_dc"], q["uv_ac"], rm, dm]], jnp.int32)
    costs = Costs()
    mbc = np.zeros((1, 8), np.int32)
    mbc[0, :5] = np.asarray(costs.mbmode_costs[0][:5], np.int64)
    btab = np.asarray(costs.bmode_costs, np.int64).reshape(100, 10)
    bhi = jnp.asarray((btab >> 8).astype(np.float32), jnp.bfloat16)
    blo = jnp.asarray((btab & 255).astype(np.float32), jnp.bfloat16)
    mbc = jnp.asarray(mbc)

    interpret = jax.default_backend() != "tpu"
    kf = EID._kf_fn(R, C, interpret)

    def one(oy1, ou1, ov1):
        co, _sp, md, ry, ru, rv = kf(EID._plane_tiles(oy1, R, C, 16),
                                     EID._plane_tiles(ou1, R, C, 8),
                                     EID._plane_tiles(ov1, R, C, 8),
                                     scalars, mbc, bhi, blo)
        return co, ry

    def shard_fn(oy_s, ou_s, ov_s):
        co, ry = jax.vmap(one)(oy_s, ou_s, ov_s)
        # exit state for the rebase chain: every device sees every
        # chunk's reconstructed entry keyframe
        exit_y = jax.lax.all_gather(ry[-1], axis).reshape(
            (-1,) + ry.shape[1:])
        return co, exit_y

    spec = P(axis)
    fn = jax.shard_map(shard_fn, mesh=mesh, check_vma=False,
                       in_specs=(spec, spec, spec),
                       out_specs=(spec, P(None)))
    co, exit_y = jax.jit(fn)(oy, ou, ov)
    return exit_y, co


def gop_rebase_chain(mesh, mb_rows, mb_cols, n_frames, axis="gop"):
    """Pipelined chunk rebase over the mesh (reference reencode.cc:305-381
    + the ExCamera mu pipeline): every device holds one chunk's frames
    (original rasters + fixed prediction modes/MVs); the exit references
    chain device-to-device around the ring with ``ppermute`` over ICI.

    Serial dependency, SPMD schedule: at ring step t only device t's
    compute is kept (masked select); its exit references then hop to
    device t+1.  In production multiple GOP batches stream through so
    every step does useful work on every device; the data flow and the
    collective are identical.

    Per-frame compute is the rebase residue update
    (encoder/reencode_device.py: sixtap MC at fixed MVs -> subtract ->
    fDCT -> quantize -> decoder-identical reconstruction); each frame
    refreshes ``last``, and a chunk's final reconstruction exits as all
    three references (terminate-chunk semantics, xc-terminate-chunk.cc).

    Returns a jitted fn(oy, ou, ov, refsel, smv, uvmv, splitmv, qs,
    ry0, ru0, rv0) -> (coeffs (N, F, n_mb, 400), nz (N, F, n_mb),
    exit_y (4, Hp, Wp)) with the chunk axis sharded over the mesh.
    """
    from alfalfa_tpu.encoder.reencode_device import _fn_core

    R, C = mb_rows, mb_cols
    n_dev = mesh.devices.size
    frame_fn = _fn_core(R, C)

    def tiles(plane, S):
        # (H, W) -> (R, C, S, S) int32 spatial tiles
        return plane.reshape(R, S, C, S).transpose(0, 2, 1, 3) \
            .astype(jnp.int32)

    def chunk_body(refs, oy, ou, ov, refsel, smv, uvmv, splitmv, qs):
        """Rebase this device's F frames against inherited refs."""
        def frame_body(refs, xs):
            oy1, ou1, ov1, rs, mv, uvm, sp = xs
            ry, ru, rv = refs
            co, _spf, nz, rec_y, rec_u, rec_v = frame_fn(
                tiles(oy1, 16), tiles(ou1, 8), tiles(ov1, 8),
                ry, ru, rv, rs, mv, uvm, sp, qs)
            rec = {}
            for plane, rec_t, S in (("y", rec_y, 16), ("u", rec_u, 8),
                                    ("v", rec_v, 8)):
                rec[plane] = rec_t.transpose(0, 2, 1, 3) \
                    .reshape(R * S, C * S)
            # refresh_last each frame; golden/alt inherited
            new_refs = (ry.at[1].set(rec["y"]), ru.at[1].set(rec["u"]),
                        rv.at[1].set(rec["v"]))
            return new_refs, (co, nz, rec["y"], rec["u"], rec["v"])

        refs, (co, nz, ry_f, ru_f, rv_f) = jax.lax.scan(
            frame_body, refs, (oy, ou, ov, refsel, smv, uvmv, splitmv))
        # chunk exit: final reconstruction becomes all three references
        def exit_stack(fin):
            return jnp.broadcast_to(fin[-1][None], (4,) + fin.shape[1:])
        exit_refs = (exit_stack(ry_f), exit_stack(ru_f), exit_stack(rv_f))
        return exit_refs, co, nz

    def shard_fn(oy, ou, ov, refsel, smv, uvmv, splitmv, qs,
                 ry0, ru0, rv0):
        # local shapes: (1, F, ...) chunk data; (4, Hp, Wp) initial refs
        rank = jax.lax.axis_index(axis)
        F = oy.shape[1]
        co0 = jnp.zeros((F, R * C, 400), jnp.int16)
        nz0 = jnp.zeros((F, R * C), bool)
        right = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def ring_step(t, carry):
            (ry, ru, rv), co_acc, nz_acc = carry
            new_refs, co, nz = chunk_body(
                (ry, ru, rv), oy[0], ou[0], ov[0],
                refsel[0], smv[0], uvmv[0], splitmv[0], qs[0])
            active = rank == t
            keep = lambda new, old: jnp.where(active, new, old)
            co_acc = keep(co, co_acc)
            nz_acc = keep(nz, nz_acc)
            refs = tuple(keep(n_, o_) for n_, o_ in
                         zip(new_refs, (ry, ru, rv)))
            # exit references hop one device to the right over ICI
            refs = tuple(jax.lax.ppermute(p, axis, right) for p in refs)
            return refs, co_acc, nz_acc

        refs, co, nz = jax.lax.fori_loop(
            0, n_dev, ring_step, ((ry0, ru0, rv0), co0, nz0))
        # after N hops the exit refs of device N-1 are back on device 0;
        # gather them so every shard returns the same final state
        exit_y = jax.lax.all_gather(refs[0], axis)[0]
        return co[None], nz[None], exit_y

    spec = P(axis)
    fn = jax.shard_map(
        shard_fn, mesh=mesh, check_vma=False,
        in_specs=(spec,) * 8 + (P(), P(), P()),
        out_specs=(spec, spec, P(None)))
    return jax.jit(fn)


def rebase_chain_inputs_from_ivf(path, n_chunks, n_frames):
    """Build gop_rebase_chain inputs from a REAL oracle-encoded stream:
    decoded rasters as chunk content, the stream's own reference
    selections / sub-MVs / SPLITMV layout / quantizer as the fixed
    prediction structure (codec-typical distributions, VERDICT r3 item
    8), and the keyframe reconstruction as the entry references.  Intra
    MBs are mapped to ZEROMV-from-LAST — the chain's residue update is
    inter-only (reencode_device._fn_core; the host loop re-encodes intra
    positions in the full rebase path, reencode.py)."""
    from alfalfa_tpu.decoder.decoder import Decoder
    from alfalfa_tpu.decoder.parse import FrameParser
    from alfalfa_tpu.bitstream.header import UncompressedChunk
    from alfalfa_tpu.bitstream import tables as T
    from alfalfa_tpu.util.ivf import IVFReader

    ivf = IVFReader(path)
    W, H = ivf.width, ivf.height
    R, C = (H + 15) // 16, (W + 15) // 16
    dec = Decoder(W, H)
    rasters, metas, qis = [], [], []
    for i in range(len(ivf)):
        payload = ivf.frame(i)
        chunk = UncompressedChunk(payload, W, H)
        header, arrays, _ = FrameParser(dec.state.copy()).parse(chunk)
        _show, raster = dec.decode_frame(payload)
        rasters.append((raster.y.copy(), raster.u.copy(), raster.v.copy()))
        if not chunk.key_frame:
            metas.append((arrays.ref.copy(), arrays.sub_mv.copy(),
                          arrays.uv_mv.copy(),
                          (arrays.splitmv_pid >= 0).copy()))
            qis.append(header.quant_indices)
    kf_y, kf_u, kf_v = rasters[0]

    def stack4(p):
        return np.broadcast_to(p[None], (4,) + p.shape).copy()

    oy = np.zeros((n_chunks, n_frames, R * 16, C * 16), np.int32)
    ou = np.zeros((n_chunks, n_frames, R * 8, C * 8), np.int32)
    ov = np.zeros((n_chunks, n_frames, R * 8, C * 8), np.int32)
    refsel = np.zeros((n_chunks, n_frames, R, C), np.int32)
    smv = np.zeros((n_chunks, n_frames, R, C, 4, 4, 2), np.int32)
    uvmv = np.zeros((n_chunks, n_frames, R, C, 2, 2, 2), np.int32)
    splitmv = np.zeros((n_chunks, n_frames, R, C), bool)
    for d in range(n_chunks):
        for f in range(n_frames):
            k = (d * n_frames + f) % len(metas)
            y, u, v = rasters[k + 1]
            oy[d, f], ou[d, f], ov[d, f] = y, u, v
            ref, sub_mv, uv_mv, sp = metas[k]
            intra = ref == 0
            refsel[d, f] = np.where(intra, 1, ref)      # intra -> LAST
            smv[d, f] = np.where(intra[:, :, None, None, None], 0, sub_mv)
            uvmv[d, f] = np.where(intra[:, :, None, None, None], 0, uv_mv)
            splitmv[d, f] = sp & ~intra
    from alfalfa_tpu.bitstream.tables import quantizer_values
    qs = np.zeros((n_chunks, 8), np.int32)
    for d in range(n_chunks):
        qin = qis[d % len(qis)]
        qv = qin.quantizer()
        qs[d] = [qv["y_dc"], qv["y_ac"], qv["y2_dc"], qv["y2_ac"],
                 qv["uv_dc"], qv["uv_ac"], 0, 0]
    return (oy, ou, ov, refsel, smv, uvmv, splitmv, qs), \
        (stack4(kf_y), stack4(kf_u), stack4(kf_v))


# ---------------------------------------------------------------------------
# Batched GOP decoding: ExCamera's chunk parallelism on ONE chip
# ---------------------------------------------------------------------------
#
# The reference scales decode/encode across *machines* by making chunks
# independent (state files).  On TPU the same independence lets one chip
# decode G chunks in lockstep: host token parse runs ahead (it only needs
# header-level state, never pixels), per-frame parse arrays are stacked on
# a leading GOP axis, and a single vmapped reconstruction step advances
# all G chunks at once — the sequential wavefronts amortize G-fold.

from alfalfa_tpu.bitstream.header import (UncompressedChunk,
                                          CORRUPTED_RESIDUES)
from alfalfa_tpu.decoder.parse import FrameParser, FrameArrays
from alfalfa_tpu.decoder import reconstruct_jax as _RJ
from alfalfa_tpu.state.decoder_state import DecoderState
from alfalfa_tpu.bitstream import tables as _T


_STEP_CACHE = {}
_REF_INIT_CACHE = {}


def _pack_upload(batch):
    """Flatten the parse-output pytree into ONE uint8 buffer + a static
    spec.  The interconnect charges per-transfer overhead (measured ~3 ms
    per leaf at the median over the axon tunnel — 10 leaves cost 34 ms
    where the same bytes in one buffer cost 4.7), so the step uploads a
    single buffer and the jit slices/bitcasts the segments back out.
    Segment shapes are already bucketed, so the spec (the jit cache key)
    takes few distinct values."""
    parts = []
    spec = []
    off = 0
    for k in sorted(batch):
        v = batch[k]
        if v is None:
            continue
        a = np.ascontiguousarray(v)
        flat = a.view(np.uint8).reshape(-1)
        spec.append((k, a.dtype.str, a.shape, off, flat.size))
        parts.append(flat)
        off += flat.size
    return np.concatenate(parts), tuple(spec)


def _unpack_upload(mega, spec):
    """Inverse of _pack_upload, traced inside the step jit."""
    out = {}
    for k, dstr, shape, off, size in spec:
        dt = np.dtype(dstr)
        seg = jax.lax.slice(mega, (off,), (off + size,))
        if dt.itemsize > 1:
            seg = jax.lax.bitcast_convert_type(
                seg.reshape(-1, dt.itemsize), jnp.dtype(dt))
        elif dt != np.uint8:
            seg = jax.lax.bitcast_convert_type(seg, jnp.dtype(dt))
        out[k] = seg.reshape(shape)
    return out


_COEFF_KEYS = ("coeff_delta", "coeff_val8", "desc_pos", "desc_extra",
               "vesc_pos", "vesc_val")


def _upload_merged(batch):
    """ONE H2D transfer per step: [fixed-size step segments | variable-
    capacity coefficient stream] in a single uint8 buffer.  The interconnect
    charges ~10 ms fixed per transfer (ROUND4.md), so the former two
    device_puts cost a frame-budget's worth of wall at G=8.  The coefficient
    spec's offsets are rebased past the fixed region, the scatter jit reads
    them straight out of the merged buffer (it recompiles cheaply per
    capacity bucket), and the big step jit receives a FIXED-size device
    slice so capacity changes never recompile it."""
    mega, spec_r, spec_c, off = _pack_merged(batch)
    dev = jax.device_put(mega)
    return dev, dev[:off], spec_r, spec_c


def _pack_merged(batch):
    """Host half of _upload_merged: one buffer + rebased specs."""
    batch_c = {k: batch.pop(k) for k in _COEFF_KEYS}
    mega_r, spec_r = _pack_upload(batch)
    mega_c, spec_c = _pack_upload(batch_c)
    off = mega_r.size
    spec_c = tuple((k, d, s, o + off, n) for (k, d, s, o, n) in spec_c)
    return np.concatenate([mega_r, mega_c]), spec_r, spec_c, off


def _scatter_coeffs(G, R, C, coeff_delta, coeff_val8, desc_pos, desc_extra,
                    vesc_pos, vesc_val):
    """Compact coefficient stream -> dense (G, R, C, 25, 16) int16:
    indices by prefix sum, then a sorted-unique scatter (pad deltas of 1
    walk into the scratch slots past the dense layout)."""
    ne = G * R * C * 25 * 16
    pad_n = coeff_delta.shape[0]
    delta = coeff_delta.astype(jnp.int32).at[desc_pos].add(
        desc_extra, mode="drop")
    cidx = jnp.cumsum(delta) - 1
    cval = coeff_val8.astype(jnp.int16).at[vesc_pos].set(
        vesc_val, mode="drop")
    return jnp.zeros((ne + pad_n,), jnp.int16).at[cidx].set(
        cval, unique_indices=True, indices_are_sorted=True)[:ne] \
        .reshape(G, R, C, 25, 16)


_SCATTER_CACHE = {}


def _scatter_fn(G, R, C, spec):
    """Jitted coefficient scatter over a packed upload segment.  Kept as
    its OWN dispatch so the capacity buckets (which vary with content)
    never key a recompile of the big decode step — only this small
    scatter, which XLA compiles in well under a second."""
    key = (G, R, C, spec)
    fn = _SCATTER_CACHE.get(key)
    if fn is None:
        def run(mega):
            d = _unpack_upload(mega, spec)
            return _scatter_coeffs(G, R, C,
                                   *(d[k] for k in _COEFF_KEYS))
        fn = jax.jit(run)
        _SCATTER_CACHE[key] = fn
    return fn


def _init_packed_refs(G, H, W):
    """Zero-initialized device reference stacks in MC layout, as ONE
    jitted dispatch (cached per geometry)."""
    key = (G, H, W)
    fn = _REF_INIT_CACHE.get(key)
    if fn is None:
        from alfalfa_tpu.ops.sixtap_pallas import pad_refs, pack_refs32

        def build():
            return {p: pack_refs32(pad_refs(jnp.zeros((G, 4, h, w),
                                                      jnp.uint8)))
                    for p, h, w in (("y", H, W), ("u", H // 2, W // 2),
                                    ("v", H // 2, W // 2))}
        fn = jax.jit(build)
        _REF_INIT_CACHE[key] = fn
    return fn()
_QF_KEYS = ("y_dc", "y_ac", "y2_dc", "y2_ac", "uv_dc", "uv_ac")


def _parse_threads(G):
    """OS threads for the native GOP token parse.  The G streams are
    independent serial range-decoder chains, so cores scale them
    near-linearly; on a 1-core host the serial interleaved loop wins
    (thread spawn + contention cost, measured round 2).  Override with
    ALFALFA_PARSE_THREADS=N (0/1 = serial)."""
    env = os.environ.get("ALFALFA_PARSE_THREADS")
    if env is not None:
        try:
            return max(1, min(int(env), G))
        except ValueError:
            pass
    return max(1, min(os.cpu_count() or 1, G))


class BatchedGopDecoder:
    """Decode G independent, frame-type-aligned GOPs in lockstep.

    All GOPs must have the same dimensions and the same per-position frame
    type (true for fixed-GOP encodes and for ExCamera chunks).  Decoded
    rasters stay on-device; fetch only what you need.
    """

    def __init__(self, width, height, n_gops):
        self.width, self.height = width, height
        self.G = n_gops
        self.mb_rows = (height + 15) // 16
        self.mb_cols = (width + 15) // 16
        self.states = [DecoderState.initial(width, height)
                       for _ in range(n_gops)]
        R, C = self.mb_rows, self.mb_cols
        self._sched = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                       for k, v in _RJ.skew_schedule(R, C).items()}
        H, W = R * 16, C * 16
        self._on_tpu = jax.default_backend() == "tpu"
        if self._on_tpu:
            # references live permanently in MC layout: edge-padded,
            # vertically byte-packed, ref-slot-stacked (G, 4, Hp//4, Wp)
            # int32 = [x, last, golden, alt] (slot 0 = intra, never read)
            # — kills the per-step stack+pad and the packed MC kernel's
            # in-kernel u8->i32 conversion (sixtap_pallas.pack_refs32).
            # One jitted call (cached per geometry): built eagerly this is
            # ~30 op dispatches, each charged a round trip by the tunnel.
            self.refs = _init_packed_refs(n_gops, H, W)
        else:
            z_y = jnp.zeros((n_gops, H, W), jnp.uint8)
            z_uv = jnp.zeros((n_gops, H // 2, W // 2), jnp.uint8)
            # (last, golden, alternative) per plane
            self.refs = {"y": (z_y, z_y, z_y), "u": (z_uv, z_uv, z_uv),
                         "v": (z_uv, z_uv, z_uv)}
        self._blk_buffers = None
        self._step_cache = {}

    # -- host side -----------------------------------------------------------

    def parse_frame_batch(self, payloads):
        """Parse one frame from each GOP (list of G byte strings).  Returns
        the stacked device inputs + flags; advances per-GOP header state.

        The bit-serial phases run as ONE native call each across the whole
        batch (MB headers, then tokens), with the G independent range-
        decoder chains interleaved so they overlap in the out-of-order
        core — the host-side mirror of the TPU's GOP-lockstep decode."""
        from alfalfa_tpu.util import tracing
        G, R, C = self.G, self.mb_rows, self.mb_cols
        with tracing.stage("parse.headers"):
            chunks = [UncompressedChunk(payloads[g], self.width,
                                        self.height) for g in range(G)]
            key_frames = {c.key_frame for c in chunks}
            if len(key_frames) != 1:
                raise ValueError("GOPs must be frame-type aligned")
            key_frame = key_frames.pop()

            parsers = [FrameParser(self.states[g], sparse_tokens=True,
                                   defer_tokens=True) for g in range(G)]
            hdr = [parsers[g].parse_header_phase(chunks[g])
                   for g in range(G)]

        clean = all(c.corruption_level == 0 for c in chunks)

        # MB headers: one interleaved native call over the batch; the
        # outputs land in (G, ...) slabs the device packing uses directly
        _t_mb = time.perf_counter()
        S = None
        if clean:
            try:
                from alfalfa_tpu.native import bitwork
                S = bitwork.parse_mb_headers_gop(
                    [(hdr[g][2], hdr[g][0], hdr[g][1], key_frame)
                     for g in range(G)], R, C, _T.KF_B_MODE_PROBS,
                    threads=_parse_threads(G))
            except (ImportError, AttributeError, OSError):
                S = None
        per = []
        if S is not None:
            for g in range(G):
                arrays = FrameArrays(
                    R, C,
                    ymode=S["ymode"][g], uvmode=S["uvmode"][g],
                    ref=S["ref"][g], segment=np.zeros((R, C), np.uint8),
                    skip_coeff=S["skip"][g].view(bool),
                    has_nonzero=np.zeros((R, C), bool),
                    y2_coded=S["y2_coded"][g].view(bool),
                    bmode=S["bmode"][g], sub_mv=S["sub_mv"][g],
                    uv_mv=S["uv_mv"][g], splitmv_pid=S["splitmv_pid"][g],
                    segment_update=S["segment_update"][g],
                    alloc_coeffs=False)
                parsers[g]._segment_updates = arrays.segment_update
                parsers[g]._apply_segmentation_map(arrays)
                per.append((hdr[g][0], arrays, chunks[g], hdr[g][1],
                            parsers[g]))
        else:
            for g in range(G):
                header, fp, bd = hdr[g]
                arrays = parsers[g]._parse_macroblock_headers(
                    bd, header, fp, key_frame=key_frame,
                    error_concealment=(not key_frame
                                       and chunks[g].corruption_level
                                       > CORRUPTED_RESIDUES))
                parsers[g]._apply_segmentation_map(arrays)
                per.append((header, arrays, chunks[g], fp, parsers[g]))
            S = dict(
                ymode=np.stack([p[1].ymode for p in per]),
                uvmode=np.stack([p[1].uvmode for p in per]),
                ref=np.stack([p[1].ref for p in per]),
                skip=np.stack([p[1].skip_coeff for p in per]).astype(np.uint8),
                y2_coded=np.stack([p[1].y2_coded for p in per]).astype(np.uint8),
                bmode=np.stack([p[1].bmode for p in per]),
                sub_mv=np.stack([p[1].sub_mv for p in per]),
                splitmv_pid=np.stack([p[1].splitmv_pid for p in per]))

        # token decode: the G independent streams start NOW on background
        # OS threads (one native call; bit-serial range decode is the parse
        # wall) and everything below that doesn't need coefficients — MV /
        # quantizer / loop-filter packing — overlaps with them; the join
        # sits right before the coefficient-stream packing
        tracing.add("parse.mb_headers", time.perf_counter() - _t_mb)
        _t_tok = time.perf_counter()
        token_job = None
        hnz = None
        if clean:
            try:
                from alfalfa_tpu.native import bitwork
                frame_parts = [
                    p[2].dct_partitions(
                        1 << p[0].log2_number_of_dct_partitions)
                    for p in per]
                hnz = np.zeros((G, R, C), np.uint8)
                token_job = bitwork.parse_tokens_gop_async(
                    frame_parts, R, C, [p[3].coeff_probs for p in per],
                    S["skip"], S["y2_coded"], hnz,
                    threads=_parse_threads(G))
            except (ImportError, AttributeError, OSError):
                token_job = None

        tracing.add("parse.tok_start", time.perf_counter() - _t_tok)
        _t_pack = time.perf_counter()

        def bucket(n, floor):
            # coarse pow4 buckets: shape variety costs minutes of XLA
            # compile time per variant
            b = floor
            while b < n:
                b <<= 2
            return b

        smv = S["sub_mv"]
        mv0 = smv[:, :, :, 0, 0, :]
        # non-SPLITMV MBs have all 16 sub-MVs equal by construction, so the
        # parser's splitmv_pid flag replaces a 16x sub-MV equality scan
        # (rarely a SPLITMV MB's sub-MVs are all equal — the sparse escape
        # path still decodes those correctly, just less compactly)
        split = S["splitmv_pid"] >= 0
        sidx = np.flatnonzero(split)
        cap_s = bucket(len(sidx), 256)
        split_idx = np.zeros(cap_s, np.int32)
        split_val = np.zeros((cap_s, 4, 4, 2), np.int16)
        split_idx[:len(sidx)] = sidx
        split_val[:len(sidx)] = smv.reshape(-1, 4, 4, 2)[sidx]
        # pad entries re-write slot split_idx[0] (or MB 0) with its own value
        pad_row = sidx[0] if len(sidx) else 0
        split_idx[len(sidx):] = pad_row
        split_val[len(sidx):] = smv.reshape(-1, 4, 4, 2)[pad_row]

        # per-segment dequant factor tables + segment map (device gathers);
        # one vectorized quantizer_values call over the (G, 4) index grid
        qf_table = np.zeros((self.G, len(_QF_KEYS), 4), np.int16)
        qi = np.zeros((G, 4), np.int32)
        dq = np.zeros((G, 5), np.int32)
        for g, (header, _arrays, _chunk, _fp, _parser) in enumerate(per):
            qin = header.quant_indices
            seg = self.states[g].segmentation
            if seg is not None:
                # uint8 wrap before clamp (frame.cc:192-197 semantics,
                # QuantIndices.quantizer)
                adj = np.asarray(seg.quantizer_adjustments[:4], np.int32)
                qi[g] = (adj + (0 if seg.absolute else qin.y_ac_qi)) & 0xFF
            else:
                qi[g] = qin.y_ac_qi
            dq[g] = (qin.y_dc or 0, qin.y2_dc or 0, qin.y2_ac or 0,
                     qin.uv_dc or 0, qin.uv_ac or 0)
        from alfalfa_tpu.bitstream.tables import quantizer_values
        qv = quantizer_values(qi, dq[:, 0:1], dq[:, 1:2], dq[:, 2:3],
                              dq[:, 3:4], dq[:, 4:5])
        for ki, k in enumerate(_QF_KEYS):
            qf_table[:, ki] = qv[k]

        # loop-filter base level per MB (pre-clip, with segment/mode/ref
        # adjustments; _frame_lf_params semantics) — limits derive on
        # device.  Per-lane scalars gathered into (G, ...) tables, then one
        # vectorized expression over the whole batch.
        def lf_base_batch():
            lf_level = np.array([p[0].loop_filter_level for p in per],
                                np.int32)
            has_segf = np.zeros(G, bool)
            seg_abs = np.zeros(G, bool)
            segf = np.zeros((G, 4), np.int32)
            has_fa = np.zeros(G, bool)
            fa_ref = np.zeros((G, 4), np.int32)
            fa_mode = np.zeros((G, 4), np.int32)
            for g in range(G):
                seg = self.states[g].segmentation
                if seg is not None:
                    has_segf[g] = True
                    seg_abs[g] = seg.absolute
                    segf[g] = seg.filter_adjustments[:4]
                fa = self.states[g].filter_adjustments
                if fa is not None:
                    has_fa[g] = True
                    fa_ref[g] = fa.ref_adjustments[:4]
                    fa_mode[g] = fa.mode_adjustments[:4]
            gi = np.arange(G)[:, None, None]
            segmap = np.stack([p[1].segment for p in per]).astype(np.int32)
            lfg = lf_level[:, None, None]
            base = np.where(
                has_segf[:, None, None],
                segf[gi, segmap]
                + np.where(seg_abs[:, None, None], 0, lfg),
                lfg)
            ref = S["ref"].astype(np.int32)
            ymode = S["ymode"].astype(np.int32)
            mode_adj = np.where(
                ref == _T.CURRENT_FRAME,
                np.where(ymode == _T.B_PRED, fa_mode[:, 0:1, None], 0),
                np.where(ymode == _T.ZEROMV, fa_mode[:, 1:2, None],
                         np.where(ymode == _T.SPLITMV,
                                  fa_mode[:, 3:4, None],
                                  fa_mode[:, 2:3, None])))
            adj = np.where(has_fa[:, None, None],
                           fa_ref[gi, ref] + mode_adj, 0)
            return np.where(lfg > 0, base + adj, 0).astype(np.int16)

        # union of diagonals containing intra MBs (skip the rest on device;
        # the Pallas intra kernel does this internally on TPU)
        if key_frame or jax.default_backend() == "tpu":
            intra_active = None
        else:
            R, C = self.mb_rows, self.mb_cols
            d_of = 2 * np.arange(R)[:, None] + np.arange(C)[None, :]
            active = np.unique(d_of[None].repeat(self.G, 0)[S["ref"] == 0])
            n_diags = 2 * (R - 1) + C
            # two shape buckets only (compile time): sparse or full
            A = 16 if len(active) <= 16 else n_diags
            intra_active = np.full(A, n_diags, np.int32)
            intra_active[:min(len(active), A)] = active[:A]

        # pack the small per-MB maps into two buffers: each device_put is
        # a separate tunnel dispatch, and ~15 of them cost more than the
        # bytes themselves.  Interframes carry bmode as SPARSE escapes
        # (B_PRED MBs only, like SPLITMV sub-MVs) — dense bmode was 16 of
        # buf8's 22 bytes/MB, ~0.9 MB/step at 720p G=16; keyframes keep
        # the dense layout (most MBs are B_PRED there).
        nb8 = 22 if key_frame else 6
        buf8 = np.empty((G, R, C, nb8), np.int8)
        for g, pp in enumerate(per):
            buf8[g, :, :, 0] = pp[1].segment
        buf8[:, :, :, 1] = S["y2_coded"]
        # slot 2 (has_nonzero) is filled after the token-thread join below
        buf8[:, :, :, 3] = S["ymode"]
        buf8[:, :, :, 4] = S["uvmode"]
        buf8[:, :, :, 5] = S["ref"]
        bmode_idx = bmode_val = None
        if key_frame:
            buf8[:, :, :, 6:22] = S["bmode"].reshape(G, R, C, 16)
        else:
            bflat = S["bmode"].reshape(-1, 16)
            bp = np.flatnonzero(S["ymode"].reshape(-1) == 4)   # B_PRED
            cap_b = bucket(len(bp), 64)
            bmode_idx = np.zeros(cap_b, np.int32)
            bmode_val = np.zeros((cap_b, 16), np.int8)
            bmode_idx[:len(bp)] = bp
            bmode_val[:len(bp)] = bflat[bp]
            pad_b = bp[0] if len(bp) else 0
            bmode_idx[len(bp):] = pad_b
            bmode_val[len(bp):] = bflat[pad_b]

        if key_frame:
            fl = np.zeros((5, G), np.int16)
        else:
            fl = np.array(
                [[p[0].copy_buffer_to_alternate or 0 for p in per],
                 [p[0].copy_buffer_to_golden or 0 for p in per],
                 [p[0].refresh_golden_frame for p in per],
                 [p[0].refresh_alternate_frame for p in per],
                 [p[0].refresh_last for p in per]], np.int16)
        buf16 = np.concatenate([
            mv0.ravel().astype(np.int16),
            lf_base_batch().ravel(),
            qf_table.ravel(),
            np.array([p[0].sharpness_level for p in per], np.int16),
            fl.ravel()])

        # join the token threads (they ran during all the packing above);
        # fall back to the Python token parser if the native path was
        # unavailable or failed
        tracing.add("parse.pack", time.perf_counter() - _t_pack)
        _t_join = time.perf_counter()
        batch_blocks = token_job.join() if token_job is not None else None
        tracing.add("parse.tok_join", time.perf_counter() - _t_join)
        _t_coeff = time.perf_counter()
        if batch_blocks is not None:
            S["has_nonzero"] = hnz
            for g, p in enumerate(per):
                p[1].has_nonzero[:] = hnz[g].view(bool)
        else:
            for header, arrays, chunk, fp, parser in per:
                parser._parse_tokens(chunk, header, arrays, fp)
            S["has_nonzero"] = np.stack(
                [p[1].has_nonzero for p in per]).astype(np.uint8)
        buf8[:, :, :, 2] = S["has_nonzero"]

        # The host->device link is the scaling bottleneck, so uploads are
        # minimal: nonzero coefficients as block records (emitted directly
        # by the C token parser), one MV per macroblock with sparse SPLITMV
        # escapes, and small per-MB maps.  Chroma MVs, loop filter limits,
        # and dequant factors are re-derived on device.
        frame_elems = self.mb_rows * self.mb_cols * 25 * 16
        if batch_blocks is None:
            # fallback: per-frame elementwise sparse (token order) -> the
            # same compact delta stream the native parser emits
            sp = [p[1].coeff_sparse for p in per]
            eidx = np.concatenate(
                [idx.astype(np.int64) + g * frame_elems
                 for g, (idx, _v) in enumerate(sp)])
            eval_ = np.concatenate([v for _i, v in sp]).astype(np.int64)
            order = np.argsort(eidx, kind="stable")
            eidx, eval_ = eidx[order], eval_[order]
            d = np.diff(eidx, prepend=-1)
            dpos = np.flatnonzero(d > 255).astype(np.int32)
            vpos = np.flatnonzero((eval_ < -128) | (eval_ > 127)) \
                .astype(np.int32)
            batch_blocks = dict(
                delta=np.minimum(d, 255).astype(np.uint8),
                val=np.where((eval_ < -128) | (eval_ > 127), 0, eval_)
                .astype(np.int8),
                desc_pos=dpos,
                desc_extra=(d[dpos] - 255).astype(np.int32),
                vesc_pos=vpos, vesc_val=eval_[vpos].astype(np.int16))
        cs = batch_blocks
        n_nz = len(cs["delta"])

        def bucket2(n, floor):
            b = floor
            while b < n:
                b <<= 1
            return b

        def bucket125(n, floor):
            # geometric 1.25x buckets, 4K-element aligned: the coefficient
            # scatter runs as its own small jit (BatchedGopDecoder._scatter)
            # so shape variants compile cheaply; pow2 buckets wasted up to
            # half the largest upload segment in transfer bytes
            b = floor
            while b < n:
                b = ((b + (b >> 2)) + 4095) & ~4095
            return b

        cap = bucket125(n_nz, 1 << 15)
        # pad deltas of 1 keep the reconstructed indices ascending and
        # unique, walking into the scratch slots past the dense layout
        coeff_delta = np.ones(cap, np.uint8)
        coeff_val8 = np.zeros(cap, np.int8)
        coeff_delta[:n_nz] = cs["delta"]
        coeff_val8[:n_nz] = cs["val"]
        ecap = bucket2(max(len(cs["desc_pos"]), len(cs["vesc_pos"])), 512)
        desc_pos = np.full(ecap, cap, np.int32)     # OOB -> dropped
        desc_extra = np.zeros(ecap, np.int32)
        vesc_pos = np.full(ecap, cap, np.int32)
        vesc_val = np.zeros(ecap, np.int16)
        desc_pos[:len(cs["desc_pos"])] = cs["desc_pos"]
        desc_extra[:len(cs["desc_extra"])] = cs["desc_extra"]
        vesc_pos[:len(cs["vesc_pos"])] = cs["vesc_pos"]
        vesc_val[:len(cs["vesc_val"])] = cs["vesc_val"]

        batch = dict(
            intra_active=intra_active,
            coeff_delta=coeff_delta, coeff_val8=coeff_val8,
            desc_pos=desc_pos, desc_extra=desc_extra,
            vesc_pos=vesc_pos, vesc_val=vesc_val,
            split_idx=split_idx, split_val=split_val,
            buf8=buf8, buf16=buf16,
        )
        if bmode_idx is not None:
            batch["bmode_idx"] = bmode_idx
            batch["bmode_val"] = bmode_val
        show = [p[2].show_frame for p in per]
        tracing.add("parse.coeff_pack", time.perf_counter() - _t_coeff)
        return key_frame, batch, None if key_frame else True, show

    # -- device side -----------------------------------------------------------

    def _step(self, key_frame, on_tpu=None, spec=None):
        # module-level cache: new decoder instances at the same geometry
        # must reuse the compiled step
        if on_tpu is None:
            on_tpu = jax.default_backend() == "tpu"
        key = (self.mb_rows, self.mb_cols, self.G, key_frame, on_tpu, spec)
        if key in _STEP_CACHE:
            return _STEP_CACHE[key]
        R, C = self.mb_rows, self.mb_cols
        sched = self._sched
        if on_tpu:
            # one merged wavefront kernel over the whole batch (sublane-
            # folded); intra_active is unused — the kernel cond-skips
            # diagonals without intra MBs internally
            G = self.G

            def vone(coeffs, qf, y2c, nz, ymode, uvmode, bmode, refsel,
                     smv, uvmv, ry, ru, rv, lfp, intra_active):
                return _RJ.reconstruct_core_batch(
                    R, C, G, key_frame, coeffs, qf, y2c, nz,
                    ymode, uvmode, bmode, refsel, smv, uvmv,
                    ry, ru, rv, lfp, refs_prepadded=True)
        else:
            def one(coeffs, qf, y2c, nz, ymode, uvmode, bmode, refsel, smv,
                    uvmv, ry, ru, rv, lfp, intra_active):
                return _RJ.reconstruct_core(R, C, key_frame, coeffs, qf,
                                            y2c, nz, ymode, uvmode, bmode,
                                            refsel, smv, uvmv, ry, ru, rv,
                                            lfp, sched, intra_active)

            # intra_active is shared across the GOP batch (union list)
            vone = jax.vmap(one, in_axes=(0,) * 14 + (None,))

        def sel3(cond, a, b):
            return jnp.where(cond[:, None, None], a, b)

        def step(batch, refs):
            if on_tpu:
                def refstack(plane):
                    return refs[plane]      # persistent (G, 4, Hp, Wp)
            else:
                def refstack(plane):
                    last, gold, alt = refs[plane]
                    return jnp.stack([last, last, gold, alt], axis=1)

            i32 = lambda x: x.astype(jnp.int32)
            buf8 = batch["buf8"]
            G = buf8.shape[0]
            n_mb = G * R * C

            # unpack buf16: [mv0, lf_base, qf_table, sharpness, flags]
            b16 = batch["buf16"]
            o = 0
            mv0 = i32(b16[o:o + n_mb * 2]).reshape(G, R, C, 2)
            o += n_mb * 2
            lf_base = i32(b16[o:o + n_mb]).reshape(G, R, C)
            o += n_mb
            qf_table = i32(b16[o:o + G * 6 * 4]).reshape(G, 6, 4)
            o += G * 6 * 4
            sharpness = i32(b16[o:o + G])
            o += G
            fls = i32(b16[o:o + 5 * G]).reshape(5, G)

            seg8 = buf8[:, :, :, 0].astype(jnp.uint8)
            y2c = buf8[:, :, :, 1] != 0
            nz = buf8[:, :, :, 2] != 0
            ymode = i32(buf8[:, :, :, 3])
            uvmode = i32(buf8[:, :, :, 4])
            refsel = i32(buf8[:, :, :, 5])
            if buf8.shape[-1] == 22:
                bmode = i32(buf8[:, :, :, 6:22]).reshape(G, R, C, 4, 4)
            else:
                # interframe: sparse B_PRED escapes (value for non-B_PRED
                # MBs is never read; 0 keeps the kernel selects in range)
                bmode = jnp.zeros((n_mb, 16), jnp.int32).at[
                    batch["bmode_idx"]].set(i32(batch["bmode_val"])) \
                    .reshape(G, R, C, 4, 4)

            if "coeffs16" in batch:
                coeffs = batch["coeffs16"].astype(jnp.int32)
            else:
                coeffs = _scatter_coeffs(
                    G, R, C, *(batch[k] for k in _COEFF_KEYS)) \
                    .astype(jnp.int32)

            sub_mv = jnp.broadcast_to(
                mv0[:, :, :, None, None, :],
                (G, R, C, 4, 4, 2)).reshape(n_mb, 4, 4, 2)
            sub_mv = sub_mv.at[batch["split_idx"]].set(
                i32(batch["split_val"])).reshape(G, R, C, 4, 4, 2)
            # chroma MVs: quadrant sums with symmetric rounding
            # (luma_to_chroma, macroblock.cc:289-299)
            q = sub_mv.reshape(G, R, C, 2, 2, 2, 2, 2) \
                .sum(axis=(4, 6))              # (G,R,C,2,2,2)
            uv_mv = jnp.sign(q) * ((jnp.abs(q) + 4) >> 3)

            seg = seg8.astype(jnp.int32).reshape(G, -1)
            qf = {k: jnp.take_along_axis(qf_table[:, ki], seg, axis=1)
                      .reshape(G, R, C)
                  for ki, k in enumerate(_QF_KEYS)}

            # loop-filter limits from the base level (loopfilter.cc:82-128)
            base = lf_base
            sharp = sharpness[:, None, None]
            fl = jnp.clip(base, 0, 63)
            interior = jnp.where(
                sharp > 0,
                jnp.minimum(fl >> jnp.where(sharp > 4, 2, 1), 9 - sharp), fl)
            interior = jnp.maximum(interior, 1)
            hev = ((fl >= 15).astype(jnp.int32) + (fl >= 40).astype(jnp.int32)
                   + ((fl >= 20) & (not key_frame)).astype(jnp.int32))
            level = jnp.where(base > 0, fl, 0)
            skip_sb = y2c & ~nz
            lfp = (level, interior, (fl + 2) * 2 + interior,
                   fl * 2 + interior, hev, skip_sb)

            y, u, v = vone(coeffs, qf,
                           y2c, nz, ymode, uvmode, bmode,
                           refsel, sub_mv,
                           uv_mv, refstack("y"), refstack("u"),
                           refstack("v"), lfp, batch.get("intra_active"))
            new_refs = {}
            if on_tpu:
                from alfalfa_tpu.ops.sixtap_pallas import (pad_refs,
                                                           pack_refs32)
                for plane, raster in (("y", y), ("u", u), ("v", v)):
                    pr = pack_refs32(pad_refs(raster))  # (G, Hp//4, Wp)
                    if key_frame:
                        new_refs[plane] = jnp.broadcast_to(
                            pr[:, None], (G, 4) + pr.shape[1:])
                        continue
                    stack = refs[plane]
                    last, gold, alt = stack[:, 1], stack[:, 2], stack[:, 3]
                    # copy/refresh semantics (frame.cc:271-307);
                    # golden<-alternate reads the *updated* alternate
                    copy_alt, copy_gold = fls[0], fls[1]
                    alt = sel3(copy_alt == 1, last,
                               sel3(copy_alt == 2, gold, alt))
                    gold = sel3(copy_gold == 1, last,
                                sel3(copy_gold == 2, alt, gold))
                    gold = sel3(fls[2] != 0, pr, gold)
                    alt = sel3(fls[3] != 0, pr, alt)
                    last = sel3(fls[4] != 0, pr, last)
                    new_refs[plane] = jnp.stack([last, last, gold, alt],
                                                axis=1)
                return (y, u, v), new_refs
            for plane, raster in (("y", y), ("u", u), ("v", v)):
                last, gold, alt = refs[plane]
                if key_frame:
                    new_refs[plane] = (raster, raster, raster)
                    continue
                # reference copy/refresh semantics (frame.cc:271-307);
                # golden<-alternate reads the *updated* alternate
                copy_alt, copy_gold = fls[0], fls[1]
                alt = sel3(copy_alt == 1, last,
                           sel3(copy_alt == 2, gold, alt))
                gold = sel3(copy_gold == 1, last,
                            sel3(copy_gold == 2, alt, gold))
                gold = sel3(fls[2] != 0, raster, gold)
                alt = sel3(fls[3] != 0, raster, alt)
                last = sel3(fls[4] != 0, raster, last)
                new_refs[plane] = (last, gold, alt)
            return (y, u, v), new_refs

        if spec is not None:
            # packed entry: the coefficient scatter ran as its own
            # dispatch (_scatter_fn); everything else arrives as ONE
            # uint8 buffer
            def packed_step(mega, coeffs16, refs):
                d = _unpack_upload(mega, spec)
                d["coeffs16"] = coeffs16
                return step(d, refs)
            jitted = jax.jit(packed_step)
        else:
            jitted = jax.jit(step)
        _STEP_CACHE[key] = jitted
        return jitted

    def decode_frame_batch(self, payloads):
        """Parse + reconstruct one frame position across all GOPs.
        Returns (G, H, W) luma + chroma device arrays (padded dims)."""
        from alfalfa_tpu.util import tracing
        with tracing.stage("gop.parse"):
            key_frame, batch, flags, show = self.parse_frame_batch(payloads)
        with tracing.stage("gop.upload"):
            dev, dev_r, spec_r, spec_c = _upload_merged(batch)
        with tracing.stage("gop.step_dispatch"):
            coeffs16 = _scatter_fn(self.G, self.mb_rows, self.mb_cols,
                                   spec_c)(dev)
            (y, u, v), self.refs = self._step(key_frame, spec=spec_r)(
                dev_r, coeffs16, self.refs)
        return (y, u, v), show

    def decode_stream(self, payload_batches):
        """Pipelined decode: yields ((y, u, v), show) per frame position.

        The host-side bit-serial parse of frame i+1 never depends on the
        device (reference state rides inside the jit chain), so the upload
        + step dispatch of frame i runs on a worker thread while the main
        thread parses i+1 — wall time per step becomes
        max(parse, upload+dispatch) instead of their sum.  On a 1-core
        host the worker's device_put mostly waits on the interconnect
        with the GIL released, so the overlap is real.

        Axon caveat: a FIRST-EVER jit compile issued from the worker
        thread wedges the tunnel client (dispatch "succeeds" but fetches
        of its outputs never complete).  Callers on the axon backend
        should run one decode_frame_batch pass first so the step jits
        compile on the main thread (bench.py does)."""
        from concurrent.futures import ThreadPoolExecutor

        def submit(key_frame, batch, show):
            # pack + upload + dispatch all on the worker: the big memcpy
            # and the transfer wait both release the GIL, so they overlap
            # the main thread's parse of the next frame
            dev, dev_r, spec_r, spec_c = _upload_merged(batch)
            coeffs16 = _scatter_fn(self.G, self.mb_rows, self.mb_cols,
                                   spec_c)(dev)
            out, self.refs = self._step(key_frame, spec=spec_r)(
                dev_r, coeffs16, self.refs)
            return out, show

        with ThreadPoolExecutor(1) as ex:
            pending = None
            for payloads in payload_batches:
                key_frame, batch, _flags, show = \
                    self.parse_frame_batch(payloads)
                if pending is not None:
                    yield pending.result()
                pending = ex.submit(submit, key_frame, batch, show)
            if pending is not None:
                yield pending.result()


def decode_gops(gop_payloads, width, height):
    """Decode G aligned GOPs; returns per-GOP lists of (y, u, v) device
    arrays for shown frames."""
    G = len(gop_payloads)
    n_frames = {len(g) for g in gop_payloads}
    if len(n_frames) != 1:
        raise ValueError("GOPs must have equal frame counts")
    dec = BatchedGopDecoder(width, height, G)
    out = [[] for _ in range(G)]
    for f in range(n_frames.pop()):
        (y, u, v), show = dec.decode_frame_batch(
            [gop_payloads[g][f] for g in range(G)])
        for g in range(G):
            if show[g]:
                out[g].append((y[g], u[g], v[g]))
    return out
