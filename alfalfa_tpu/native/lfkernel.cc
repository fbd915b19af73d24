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

// x264-window integer SSIM (util/ssim.py twin; reference util/ssim.cc
// wraps libx264's formulation).  Per-4x4-block integer sums, 8x8
// overlapping windows on the 4-pixel grid, double combine.  Summation
// runs row-major over windows (not numpy pairwise), so the last few ulps
// can differ from the numpy fallback; both encoder paths share this
// function, so mode/level decisions stay consistent.
extern "C" double vp8_ssim(const unsigned char* a, const unsigned char* b,
                           int stride_a, int stride_b, int w, int h) {
  const long long C1 = 416, C2 = 235963;
  int bh = h / 4, bw = w / 4;
  if (bh < 2 || bw < 2) return 1.0;
  // per-4x4-block sums
  static thread_local long long *s1 = nullptr, *s2 = nullptr, *ss = nullptr,
                                *s12 = nullptr;
  static thread_local int cap = 0;
  if (bh * bw > cap) {
    delete[] s1; delete[] s2; delete[] ss; delete[] s12;
    cap = bh * bw;
    s1 = new long long[cap]; s2 = new long long[cap];
    ss = new long long[cap]; s12 = new long long[cap];
  }
  for (int by = 0; by < bh; by++) {
    for (int bx = 0; bx < bw; bx++) {
      long long t1 = 0, t2 = 0, tss = 0, t12 = 0;
      for (int y = 0; y < 4; y++) {
        const unsigned char* pa = a + (by * 4 + y) * stride_a + bx * 4;
        const unsigned char* pb = b + (by * 4 + y) * stride_b + bx * 4;
        for (int x = 0; x < 4; x++) {
          int va = pa[x], vb = pb[x];
          t1 += va; t2 += vb; tss += va * va + vb * vb; t12 += va * vb;
        }
      }
      int i = by * bw + bx;
      s1[i] = t1; s2[i] = t2; ss[i] = tss; s12[i] = t12;
    }
  }
  double acc = 0.0;
  for (int by = 0; by + 1 < bh; by++) {
    for (int bx = 0; bx + 1 < bw; bx++) {
      int i = by * bw + bx;
      long long t1 = s1[i] + s1[i + 1] + s1[i + bw] + s1[i + bw + 1];
      long long t2 = s2[i] + s2[i + 1] + s2[i + bw] + s2[i + bw + 1];
      long long tss = ss[i] + ss[i + 1] + ss[i + bw] + ss[i + bw + 1];
      long long t12 = s12[i] + s12[i + 1] + s12[i + bw] + s12[i + bw + 1];
      long long vars = tss * 64 - t1 * t1 - t2 * t2;
      long long covar = t12 * 64 - t1 * t2;
      acc += (2.0 * (double)t1 * (double)t2 + (double)C1) *
             (2.0 * (double)covar + (double)C2) /
             ((double)(t1 * t1 + t2 * t2 + C1) * (double)(vars + C2));
    }
  }
  return acc / ((double)(bh - 1) * (double)(bw - 1));
}
