// Native host loop filter: the C++ equivalent of the reference's
// loopfilter_sse2.asm / loopfilter_filters.hh scalar kernels, used by the
// host (numpy) reconstruction path and the encoder's loop-filter search.
// Semantics are a line-for-line match of the RFC 6386 normal filter as
// embodied in alfalfa_tpu/decoder/reconstruct_np.py (itself bit-exact vs
// the reference decoder).
#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

static inline int c8(int x) { return x < -128 ? -128 : (x > 127 ? 127 : x); }
static inline int s8(int x) { return (int)(int8_t)(uint8_t)x; }

struct Limits {
  int interior, blimit, thresh;
};

// vp8_filter_mask (loopfilter_filters.hh:58-83)
static inline bool filter_mask(const Limits &l, int p3, int p2, int p1,
                               int p0, int q0, int q1, int q2, int q3) {
  return !((abs(p3 - p2) > l.interior) | (abs(p2 - p1) > l.interior) |
           (abs(p1 - p0) > l.interior) | (abs(q1 - q0) > l.interior) |
           (abs(q2 - q1) > l.interior) | (abs(q3 - q2) > l.interior) |
           (abs(p0 - q0) * 2 + abs(p1 - q1) / 2 > l.blimit));
}

static inline bool hevmask(int thresh, int p1, int p0, int q0, int q1) {
  return (abs(p1 - p0) > thresh) | (abs(q1 - q0) > thresh);
}

// vp8_filter (loopfilter_filters.hh:85-131); px in [0,255], ptrs to plane
static inline void subblock_filter(const Limits &l, uint8_t *p1, uint8_t *p0,
                                   uint8_t *q0, uint8_t *q1,
                                   int P3, int P2, int Q2, int Q3) {
  int vp1 = s8(*p1 - 128), vp0 = s8(*p0 - 128);
  int vq0 = s8(*q0 - 128), vq1 = s8(*q1 - 128);
  bool mask = filter_mask(l, P3, P2, *p1, *p0, *q0, *q1, Q2, Q3);
  bool hev = hevmask(l.thresh, *p1, *p0, *q0, *q1);

  int fv = c8(vp1 - vq1);
  if (!hev) fv = 0;
  fv = c8(fv + 3 * (vq0 - vp0));
  if (!mask) fv = 0;

  int f1 = c8(fv + 4) >> 3;
  int f2 = c8(fv + 3) >> 3;
  *q0 = (uint8_t)(c8(vq0 - f1) + 128);
  *p0 = (uint8_t)(c8(vp0 + f2) + 128);

  int fv2 = (f1 + 1) >> 1;
  if (hev) fv2 = 0;
  *q1 = (uint8_t)(c8(vq1 - fv2) + 128);
  *p1 = (uint8_t)(c8(vp1 + fv2) + 128);
}

// vp8_mbfilter (loopfilter_filters.hh:133-186)
static inline void mb_filter(const Limits &l, uint8_t *p2, uint8_t *p1,
                             uint8_t *p0, uint8_t *q0, uint8_t *q1,
                             uint8_t *q2, int P3, int Q3) {
  bool mask = filter_mask(l, P3, *p2, *p1, *p0, *q0, *q1, *q2, Q3);
  bool hev = hevmask(l.thresh, *p1, *p0, *q0, *q1);
  int vp2 = s8(*p2 - 128), vp1 = s8(*p1 - 128), vp0 = s8(*p0 - 128);
  int vq0 = s8(*q0 - 128), vq1 = s8(*q1 - 128), vq2 = s8(*q2 - 128);

  int fv = c8(c8(vp1 - vq1) + 3 * (vq0 - vp0));
  if (!mask) fv = 0;

  int f2 = hev ? fv : 0;
  int f1 = c8(f2 + 4) >> 3;
  f2 = c8(f2 + 3) >> 3;
  vq0 = c8(vq0 - f1);
  vp0 = c8(vp0 + f2);

  int w = hev ? 0 : fv;
  int u = c8((63 + w * 27) >> 7);
  vq0 = c8(vq0 - u);
  vp0 = c8(vp0 + u);
  u = c8((63 + w * 18) >> 7);
  vq1 = c8(vq1 - u);
  vp1 = c8(vp1 + u);
  u = c8((63 + w * 9) >> 7);
  vq2 = c8(vq2 - u);
  vp2 = c8(vp2 + u);

  *p2 = (uint8_t)(vp2 + 128);
  *p1 = (uint8_t)(vp1 + 128);
  *p0 = (uint8_t)(vp0 + 128);
  *q0 = (uint8_t)(vq0 + 128);
  *q1 = (uint8_t)(vq1 + 128);
  *q2 = (uint8_t)(vq2 + 128);
}

// vertical edge at column x, rows [r0, r1)
static void filter_v_edge(uint8_t *plane, int stride, int r0, int r1, int x,
                          const Limits &l, bool mb_edge) {
  for (int r = r0; r < r1; r++) {
    uint8_t *row = plane + (size_t)r * stride + x;
    if (mb_edge)
      mb_filter(l, row - 3, row - 2, row - 1, row, row + 1, row + 2,
                row[-4], row[3]);
    else
      subblock_filter(l, row - 2, row - 1, row, row + 1, row[-4], row[-3],
                      row[2], row[3]);
  }
}

// horizontal edge at row y, cols [c0, c1)
static void filter_h_edge(uint8_t *plane, int stride, int c0, int c1, int y,
                          const Limits &l, bool mb_edge) {
  uint8_t *base = plane + (size_t)y * stride;
  for (int c = c0; c < c1; c++) {
    uint8_t *px = base + c;
    int s = stride;
    if (mb_edge)
      mb_filter(l, px - 3 * s, px - 2 * s, px - s, px, px + s, px + 2 * s,
                px[-4 * s], px[3 * s]);
    else
      subblock_filter(l, px - 2 * s, px - s, px, px + s, px[-4 * s],
                      px[-3 * s], px[2 * s], px[3 * s]);
  }
}

}  // namespace

extern "C" void vp8_loopfilter_frame(
    uint8_t *y, uint8_t *u, uint8_t *v, int y_stride, int uv_stride,
    int mb_rows, int mb_cols, const int16_t *level, const int16_t *interior,
    const int16_t *mb_limit, const int16_t *sb_limit, const int16_t *hev_thr,
    const uint8_t *skip_sb) {
  for (int r = 0; r < mb_rows; r++) {
    for (int c = 0; c < mb_cols; c++) {
      int i = r * mb_cols + c;
      if (level[i] <= 0) continue;
      Limits mb{interior[i], mb_limit[i], hev_thr[i]};
      Limits sb{interior[i], sb_limit[i], hev_thr[i]};
      bool do_sb = !skip_sb[i];

      // pass order per MB (loopfilter.cc:133-154):
      // left MB edge, interior vertical, top MB edge, interior horizontal
      if (c > 0) {
        filter_v_edge(y, y_stride, r * 16, r * 16 + 16, c * 16, mb, true);
        filter_v_edge(u, uv_stride, r * 8, r * 8 + 8, c * 8, mb, true);
        filter_v_edge(v, uv_stride, r * 8, r * 8 + 8, c * 8, mb, true);
      }
      if (do_sb) {
        for (int off = 4; off < 16; off += 4)
          filter_v_edge(y, y_stride, r * 16, r * 16 + 16, c * 16 + off, sb,
                        false);
        filter_v_edge(u, uv_stride, r * 8, r * 8 + 8, c * 8 + 4, sb, false);
        filter_v_edge(v, uv_stride, r * 8, r * 8 + 8, c * 8 + 4, sb, false);
      }
      if (r > 0) {
        filter_h_edge(y, y_stride, c * 16, c * 16 + 16, r * 16, mb, true);
        filter_h_edge(u, uv_stride, c * 8, c * 8 + 8, r * 8, mb, true);
        filter_h_edge(v, uv_stride, c * 8, c * 8 + 8, r * 8, mb, true);
      }
      if (do_sb) {
        for (int off = 4; off < 16; off += 4)
          filter_h_edge(y, y_stride, c * 16, c * 16 + 16, r * 16 + off, sb,
                        false);
        filter_h_edge(u, uv_stride, c * 8, c * 8 + 8, r * 8 + 4, sb, false);
        filter_h_edge(v, uv_stride, c * 8, c * 8 + 8, r * 8 + 4, sb, false);
      }
    }
  }
}
