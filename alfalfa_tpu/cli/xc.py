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

    p = sub.add_parser("framesize", help="print per-frame compressed sizes")
    p.add_argument("input")
    p.set_defaults(func=cmd_framesize)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
