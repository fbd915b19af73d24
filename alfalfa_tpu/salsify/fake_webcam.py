"""fake-webcam: pace a y4m file onto stdout at a fixed frame rate
(reference src/salsify/fake-webcam.cc), for feeding the sender or a
v4l2loopback device without real camera hardware.
"""
import sys
import time

from alfalfa_tpu.util.y4m import Y4MReader


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(f"Usage: fake-webcam INPUT FPS", file=sys.stderr)
        return 1
    reader = Y4MReader(argv[0])
    fps = int(argv[1])
    out = sys.stdout.buffer

    interval = 1.0 / fps
    next_due = time.monotonic()
    out.write(f"YUV4MPEG2 W{reader.width} H{reader.height} "
              f"F{fps}:1 Ip A1:1 C420\n".encode())
    for y, u, v in reader:
        now = time.monotonic()
        if next_due > now:
            time.sleep(next_due - now)
        next_due += interval
        out.write(b"FRAME\n")
        out.write(y.tobytes())
        out.write(u.tobytes())
        out.write(v.tobytes())
        out.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
