"""Inter-frame encoding (motion search, mode decision). In progress."""


def encode_interframe(encoder, yuv, quant_indices, update):
    raise NotImplementedError("interframe encoding lands next")
