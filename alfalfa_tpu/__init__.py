"""alfalfa_tpu: a TPU-native VP8 video codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
excamera/alfalfa (NSDI '17 ExCamera, NSDI '18 Salsify): a VP8 encoder and
decoder in explicit state-passing style, where all codec state
(probability tables, segmentation, filter adjustments, reference rasters)
is an immutable pytree, and decoding/encoding a frame is a pure function
``(state, bits) -> (state', raster)``.

Layering (mirrors the reference architecture, reimagined TPU-first):

- ``util``       containers and I/O: IVF, y4m, SSIM, hashing
- ``bitstream``  VP8 entropy layer: bool coder, trees, spec tables, headers
- ``state``      DecoderState / References pytrees + serialization
- ``decoder``    frame parsing (host) + reconstruction (device)
- ``ops``        JAX/Pallas kernels: transforms, prediction, loop filter
- ``encoder``    RD-optimizing encoder, serializer, rate control
- ``parallel``   multi-chip GOP sharding + pipelined rebase
- ``net``        Salsify-style real-time transport
- ``cli``        the `xc` command-line toolchain
"""

__version__ = "0.1.0"
