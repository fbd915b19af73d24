"""Decoder: explicit-state VP8 decoding driver.

``Decoder`` carries (DecoderState, References) as values; decoding a frame
is ``decoder.decode(bits) -> raster`` which advances the state exactly like
the reference (decoder.cc:83-159).  The reconstruction backend is pluggable:
"numpy" (scalar oracle) or "jax" (device path).
"""
import numpy as np

from alfalfa_tpu.bitstream.header import UncompressedChunk
from alfalfa_tpu.state.decoder_state import DecoderState, References
from alfalfa_tpu.state import hashing
from .parse import FrameParser
from . import reconstruct_np


_AUTO_BACKEND = None


def resolve_backend(backend):
    """'auto' -> the jax wavefront path when a TPU is attached, the
    scalar numpy oracle otherwise (shared by the CLI, players, and the
    Salsify receiver).

    The TPU check runs in a THROWAWAY subprocess under a timeout: when
    the device tunnel/relay is down, jax backend initialization hangs
    forever in-process (the exact failure bench.py's watchdog guards
    against), and 'auto' must degrade to numpy instead of hanging every
    decode entry point.  Cached per process; override with
    ALFALFA_BACKEND=numpy|jax."""
    if backend != "auto":
        return backend
    import os
    env = os.environ.get("ALFALFA_BACKEND")
    if env in ("numpy", "jax"):
        return env
    global _AUTO_BACKEND
    if _AUTO_BACKEND is None:
        _AUTO_BACKEND = _probe_tpu_backend()
    return _AUTO_BACKEND


def _probe_tpu_backend():
    import os
    import subprocess
    import sys
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "tpu" not in plats and "axon" not in plats:
        return "numpy"          # explicitly CPU/GPU-pinned: no probe
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, sys; "
             "sys.exit(0 if jax.default_backend() == 'tpu' else 3)"],
            timeout=30, capture_output=True)
        return "jax" if r.returncode == 0 else "numpy"
    except Exception:
        return "numpy"


def reconstruct_module():
    """The reconstruction module for backend 'auto' (jax wavefronts on a
    TPU host, the scalar numpy oracle elsewhere) — for pipeline code
    that drives FrameParser itself but wants the fast backend."""
    if resolve_backend("auto") == "jax":
        from . import reconstruct_jax
        return reconstruct_jax
    from . import reconstruct_np
    return reconstruct_np


class Decoder:
    def __init__(self, width, height, state=None, references=None,
                 backend="numpy", error_concealment=False):
        self.state = state if state is not None else DecoderState.initial(width, height)
        self.references = (references if references is not None
                           else References.create(width, height))
        self.backend = resolve_backend(backend)
        self.error_concealment = error_concealment

    @property
    def width(self):
        return self.state.width

    @property
    def height(self):
        return self.state.height

    def decode_frame(self, payload):
        """Decode one compressed frame; returns (shown, Raster) and advances
        the decoder state and references."""
        from alfalfa_tpu.util import tracing

        chunk = UncompressedChunk(payload, self.width, self.height,
                                  accept_partial=self.error_concealment)
        # experimental (version 4/6) interframes decode like normal
        # interframes — the version bits are advisory (the reference's
        # tools parse them identically, e.g. xc-dump.cc:126; its playback
        # path throws Unsupported, decoder.cc:133 — we decode instead)

        with tracing.stage("decode.parse"):
            parser = FrameParser(self.state)
            header, arrays, _frame_probs = parser.parse(chunk)

        with tracing.stage("decode.reconstruct"):
            if self.backend == "jax":
                from . import reconstruct_jax
                raster = reconstruct_jax.reconstruct(
                    header, arrays, self.state, self.references,
                    chunk.key_frame)
            else:
                raster = reconstruct_np.reconstruct(
                    header, arrays, self.state, self.references,
                    chunk.key_frame)

        self._update_references(chunk.key_frame, header, raster)
        return chunk.show_frame, raster

    def _update_references(self, key_frame, header, raster):
        """Reference refresh/copy semantics (frame.cc:271-307)."""
        refs = self.references
        if key_frame:
            refs.last = refs.golden = refs.alternative = raster
            return
        if header.copy_buffer_to_alternate == 1:
            refs.alternative = refs.last
        elif header.copy_buffer_to_alternate == 2:
            refs.alternative = refs.golden
        if header.copy_buffer_to_golden == 1:
            refs.golden = refs.last
        elif header.copy_buffer_to_golden == 2:
            refs.golden = refs.alternative
        if header.refresh_golden_frame:
            refs.golden = raster
        if header.refresh_alternate_frame:
            refs.alternative = raster
        if header.refresh_last:
            refs.last = raster

    def copy(self):
        """Value-copy: the receiver keeps a minihash-addressed map of past
        decoders to restore from (salsify-receiver.cc:210-216)."""
        return Decoder(self.width, self.height, state=self.state.copy(),
                       references=self.references.copy(),
                       backend=self.backend,
                       error_concealment=self.error_concealment)

    # -- state identity ------------------------------------------------------

    def get_hash(self):
        return (self.state.hash(), self.references.last.hash(),
                self.references.golden.hash(), self.references.alternative.hash())

    def minihash(self):
        return hashing.minihash(hashing.decoder_hash(*self.get_hash()))

    def minihash_match(self, other_minihash):
        return other_minihash == 0 or self.minihash() == other_minihash


class FramePlayer:
    """Decoder + dimensions; mirrors reference player.hh:40-70."""

    def __init__(self, width, height, backend="numpy"):
        self.width, self.height = width, height
        self.decoder = Decoder(width, height, backend=backend)

    def decode(self, payload):
        """Returns the raster if the frame is shown, else None."""
        shown, raster = self.decoder.decode_frame(payload)
        return raster if shown else None

    def set_error_concealment(self, flag):
        self.decoder.error_concealment = flag

    def current_decoder(self):
        return self.decoder

    def set_decoder(self, decoder):
        self.decoder = decoder


class FilePlayer(FramePlayer):
    """IVF file + frame cursor (player.hh:72-97)."""

    def __init__(self, path, backend="numpy"):
        from alfalfa_tpu.util.ivf import IVFReader
        self.ivf = IVFReader(path)
        super().__init__(self.ivf.width, self.ivf.height, backend=backend)
        if not self.decoder.minihash_match(self.ivf.expected_decoder_minihash):
            raise ValueError("IVF expects decoder to start in different state")
        self.frame_no = 0

    def eof(self):
        return self.frame_no >= len(self.ivf)

    def advance(self):
        """Decode frames until one is shown; returns its raster."""
        while not self.eof():
            raster = self.decode(self.ivf.frame(self.frame_no))
            self.frame_no += 1
            if raster is not None:
                return raster
        raise EOFError("no more frames")

    def __iter__(self):
        while not self.eof():
            try:
                yield self.advance()
            except EOFError:
                return
