"""`xc` — the command-line toolchain (mirrors the reference frontend tools).

Subcommands grow as the framework does:
  decode       IVF -> y4m (vp8decode)
  decode-raw   IVF -> raw planar YUV on stdout (decode-to-stdout)
  framesize    per-frame compressed sizes (xc-framesize)
"""
import argparse
import sys


def cmd_decode(args):
    from alfalfa_tpu.decoder import FilePlayer
    from alfalfa_tpu.util.y4m import Y4MWriter

    player = FilePlayer(args.input, backend=args.backend)
    writer = None
    for raster in player:
        if writer is None:
            writer = Y4MWriter(args.output, player.width, player.height,
                               player.ivf.frame_rate, player.ivf.time_scale)
        y, u, v = raster.display()
        writer.append_frame(y, u, v)
    if writer:
        writer.close()


def cmd_decode_raw(args):
    from alfalfa_tpu.decoder import FilePlayer

    player = FilePlayer(args.input, backend=args.backend)
    out = sys.stdout.buffer
    for raster in player:
        out.write(raster.dump_bytes())
    out.flush()


def cmd_enc(args):
    import time
    from alfalfa_tpu.encoder.encoder import Encoder
    from alfalfa_tpu.util.ivf import IVFWriter
    from alfalfa_tpu.util.y4m import Y4MReader
    from alfalfa_tpu.util.ivf import IVFReader
    from alfalfa_tpu.decoder import FilePlayer

    if args.input_format == "y4m":
        reader = Y4MReader(args.input)
        frames = iter(reader)
        width, height = reader.width, reader.height
    else:
        ivf = IVFReader(args.input)
        width, height = ivf.width, ivf.height
        frames = (r.display() for r in FilePlayer(args.input))

    if args.ssim is None and args.y_ac_qi is None:
        args.ssim = 0.90  # xc-enc's default mode is SSIM 0.90
    if args.y_ac_qi is not None and not 0 <= args.y_ac_qi <= 127:
        parser_error = "y-ac-qi must be in [0, 127]"
        print(f"xc enc: error: {parser_error}", file=sys.stderr)
        return 2
    enc = Encoder(width, height, quality=args.quality)
    with IVFWriter(args.output, "VP80", width, height) as writer:
        for i, frame in enumerate(frames):
            t0 = time.time()
            if args.ssim is not None:
                payload = enc.encode_with_minimum_ssim(frame, args.ssim)
            else:
                payload = enc.encode_with_quantizer(frame, args.y_ac_qi)
            print(f"Encoding frame #{i}... done ({(time.time()-t0)*1000:.0f} ms).",
                  file=sys.stderr)
            writer.append_frame(payload)


def cmd_framesize(args):
    from alfalfa_tpu.util.ivf import IVFReader

    for frame in IVFReader(args.input):
        print(len(frame))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="xc", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("decode", help="decode IVF to y4m")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--backend", default="numpy", choices=["numpy", "jax"])
    p.set_defaults(func=cmd_decode)

    p = sub.add_parser("decode-raw", help="decode IVF to raw YUV on stdout")
    p.add_argument("input")
    p.add_argument("--backend", default="numpy", choices=["numpy", "jax"])
    p.set_defaults(func=cmd_decode_raw)

    p = sub.add_parser("enc", help="encode y4m/ivf to VP8 IVF")
    p.add_argument("input")
    p.add_argument("-o", "--output", default="output.ivf")
    p.add_argument("-i", "--input-format", default="y4m", choices=["y4m", "ivf"])
    p.add_argument("-y", "--y-ac-qi", type=int, default=None,
                   help="constant quantizer index")
    p.add_argument("-s", "--ssim", type=float, default=None,
                   help="target SSIM (binary search per frame)")
    p.add_argument("-q", "--quality", default="best", choices=["best", "rt"])
    p.set_defaults(func=cmd_enc)

    p = sub.add_parser("framesize", help="print per-frame compressed sizes")
    p.add_argument("input")
    p.set_defaults(func=cmd_framesize)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
