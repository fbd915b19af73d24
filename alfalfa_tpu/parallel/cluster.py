"""ExCamera cluster encoding, in-framework: parallel chunk encode + serial
rebase (the pipeline the reference realizes with xc-enc -I/-O state files
orchestrated by the external mu framework; SURVEY.md sections 2.9, 3.3).

Phase 1 fans independent chunk encodes out to worker processes — each chunk
starts with a keyframe and is terminated (refresh-all on its last frame,
xc-terminate-chunk semantics) so its exit state is fully described by the
last reference.  Phase 2 stitches serially: each chunk's leading keyframe
is re-encoded as an interframe against the previous chunk's exit state
(Encoder::reencode semantics), so the final stream decodes continuously.
"""
import multiprocessing
from concurrent.futures import ProcessPoolExecutor

import numpy as np


def _encode_one_chunk(args):
    """Worker: encode one chunk independently, terminate it, and return
    (payloads, exit_state_bytes, exit_minihash)."""
    (frames, w, h, y_ac_qi, ssim_target, quality, two_pass) = args
    from alfalfa_tpu.encoder.encoder import Encoder
    from alfalfa_tpu.bitstream.header import UncompressedChunk
    from alfalfa_tpu.decoder.decoder import Decoder
    from alfalfa_tpu.decoder.parse import FrameParser
    # workers are CPU-parallel by design: never initialize a (single-
    # client) TPU backend inside the pool — the scalar oracle is the
    # correct reconstruction here
    from alfalfa_tpu.decoder import reconstruct_np
    from alfalfa_tpu.encoder.serializer import serialize_frame
    from alfalfa_tpu.state import serdes

    enc = Encoder(w, h, quality=quality, two_pass=two_pass)
    payloads = []
    for f in frames:
        if ssim_target is not None:
            payloads.append(enc.encode_with_minimum_ssim(f, ssim_target))
        else:
            payloads.append(enc.encode_with_quantizer(f, y_ac_qi))

    # terminate-chunk: refresh all references on the last frame
    dec = Decoder(w, h)
    out = []
    for i, payload in enumerate(payloads):
        chunk = UncompressedChunk(payload, w, h)
        header, arrays, frame_probs = FrameParser(dec.state).parse(chunk)
        if i == len(payloads) - 1 and not chunk.key_frame:
            header.refresh_last = True
            header.refresh_golden_frame = True
            header.refresh_alternate_frame = True
            header.copy_buffer_to_golden = None
            header.copy_buffer_to_alternate = None
            payload = serialize_frame(header, arrays, frame_probs, False,
                                      w, h)
        raster = reconstruct_np.reconstruct(header, arrays, dec.state,
                                            dec.references, chunk.key_frame)
        dec._update_references(chunk.key_frame, header, raster)
        out.append(payload)

    return out, serdes.save_decoder(dec.state, dec.references), dec.minihash()


def parallel_encode(frames, width, height, writer, y_ac_qi=None,
                    ssim_target=None, chunk_frames=6, workers=None,
                    quality="best", two_pass=False, kf_q_weight=0.5,
                    log=None, device_rebase=False):
    """Encode `frames` (list of (y, u, v)) into `writer` (IVFWriter) via
    parallel chunk encode + serial rebase. Returns per-chunk stats."""
    from alfalfa_tpu.encoder.encoder import Encoder
    from alfalfa_tpu.encoder import reencode as RB
    from alfalfa_tpu.bitstream.header import UncompressedChunk
    from alfalfa_tpu.decoder.decoder import Decoder
    from alfalfa_tpu.decoder.parse import FrameParser
    from alfalfa_tpu.decoder.decoder import reconstruct_module
    from alfalfa_tpu.state import serdes

    chunks = [frames[i:i + chunk_frames]
              for i in range(0, len(frames), chunk_frames)]
    jobs = [(c, width, height, y_ac_qi, ssim_target, quality, two_pass)
            for c in chunks]

    # phase 1: independent chunk encodes in parallel processes
    if workers == 1 or len(chunks) == 1:
        results = [_encode_one_chunk(j) for j in jobs]
    else:
        # spawn: fork is unsafe in a process that has initialized JAX
        ctx = multiprocessing.get_context("spawn")
        with ProcessPoolExecutor(max_workers=workers, mp_context=ctx) as pool:
            results = list(pool.map(_encode_one_chunk, jobs))
    if log:
        log(f"phase 1: {len(chunks)} chunks encoded")

    # phase 2: serial rebase chain
    stats = []
    enc = None
    for g, (payloads, state_bytes, minihash) in enumerate(results):
        if g == 0:
            for p in payloads:
                writer.append_frame(p)
            enc = Encoder(width, height, quality=quality,
                          device_encode=device_rebase or None)
            enc.state, enc.references = serdes.load_decoder(state_bytes)
            enc.frame_no = 1
            stats.append({"chunk": 0, "rebased": False,
                          "bytes": sum(len(p) for p in payloads)})
            continue

        # parse this chunk's own encode as the prediction stream
        pdec = Decoder(width, height)
        pred = []
        for payload in payloads:
            chunk = UncompressedChunk(payload, width, height)
            header, arrays, _ = FrameParser(pdec.state).parse(chunk)
            raster = reconstruct_module().reconstruct(header, arrays, pdec.state,
                                                pdec.references,
                                                chunk.key_frame)
            pdec._update_references(chunk.key_frame, header, raster)
            pred.append((chunk.key_frame, header, arrays))

        n_before = writer.frame_count
        RB.reencode(enc, chunks[g], pred, kf_q_weight, False, writer)
        stats.append({"chunk": g, "rebased": True,
                      "frames": writer.frame_count - n_before})
        if log:
            log(f"phase 2: chunk {g} rebased")
    return stats
