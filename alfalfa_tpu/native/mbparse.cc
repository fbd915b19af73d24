/* Native macroblock-header parse: prediction modes, references, motion
 * vectors (census + clamp + SPLITMV), segment ids, skip flags.
 *
 * Continues from the Python-side BoolDecoder state after the frame header
 * (the header itself is cheap and stays in Python).  Semantics mirror
 * reference decoder/macroblock.cc:43-476 and scorer.hh.
 */
#include <cstdint>
#include <cstring>

namespace {

struct BoolDecoder {
  const uint8_t *data;
  int64_t pos, size;
  uint32_t range_, value;
  int bit_count;

  inline void load_octet() {
    if (pos < size) value |= data[pos++];
  }

  inline int get(int probability) {
    const uint32_t split = 1 + (((range_ - 1) * (uint32_t)probability) >> 8);
    const uint32_t big_split = split << 8;
    int ret;
    if (value >= big_split) {
      ret = 1;
      range_ -= split;
      value -= big_split;
    } else {
      ret = 0;
      range_ = split;
    }
    while (range_ < 128) {
      value <<= 1;
      range_ <<= 1;
      if (++bit_count == 8) {
        bit_count = 0;
        load_octet();
      }
    }
    return ret;
  }

  inline int tree(const int16_t *nodes, const uint8_t *probs) {
    int i = 0;
    while ((i = nodes[i + get(probs[i >> 1])]) > 0) {
    }
    return -i;
  }
};

/* spec constant trees (RFC 6386; see alfalfa_tpu/bitstream/vp8_tables.json) */
constexpr int16_t kKfYModeTree[8] = {-4, 2, 4, 6, 0, -1, -2, -3};
constexpr int16_t kYModeTree[8] = {0, 2, 4, 6, -1, -2, -3, -4};
constexpr int16_t kUvModeTree[6] = {-0, 2, -1, 4, -2, -3};
constexpr int16_t kBModeTree[18] = {0, 2, -1, 4, -2, 6, 8, 12, -3,
                                    10, -5, -6, -4, 14, -7, 16, -8, -9};
constexpr int16_t kSmallMvTree[14] = {2, 8, 4, 6, 0, -1, -2, -3, 10, 12, -4, -5, -6, -7};
constexpr int16_t kMvRefTree[8] = {-7, 2, -5, 4, -6, 6, -8, -9};
constexpr int16_t kSubmvRefTree[6] = {-10, 2, -11, 4, -12, -13};
constexpr int16_t kSplitMvTree[6] = {-3, 2, -2, 4, -0, -1};
constexpr int16_t kSegmentIdTree[6] = {2, 4, -0, -1, -2, -3};

constexpr uint8_t kKfYModeProbs[4] = {145, 156, 163, 128};
constexpr uint8_t kKfUvModeProbs[3] = {142, 114, 183};
constexpr uint8_t kInvariantBModeProbs[9] = {120, 90, 79, 133, 87, 85, 80, 111, 151};
constexpr uint8_t kMvCountsToProbs[6][4] = {
    {7, 1, 1, 143}, {14, 18, 14, 107}, {135, 64, 57, 68},
    {60, 56, 128, 65}, {159, 134, 128, 34}, {234, 188, 128, 28}};
constexpr uint8_t kSplitMvProbs[3] = {110, 111, 150};
constexpr uint8_t kSubmvRefProbs2[5][3] = {
    {147, 136, 18}, {106, 145, 1}, {179, 121, 1}, {223, 1, 34}, {208, 1, 1}};

/* SPLITMV partition layouts: per scheme, per subblock (raster index 0..15)
 * -> partition id; and the first subblock of each partition. */
struct MvPartition {
  int num_partitions;
  uint8_t part_of[16]; /* subblock raster idx -> partition */
};

constexpr MvPartition kMvPartitions[4] = {
    /* 0: two 16x8 */ {2, {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1}},
    /* 1: two 8x16 */ {2, {0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1}},
    /* 2: four 8x8 */ {4, {0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3}},
    /* 3: sixteen  */ {16, {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15}},
};

enum { DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED, NEARESTMV, NEARMV, ZEROMV,
       NEWMV, SPLITMV };
enum { B_DC_PRED = 0, B_TM_PRED, B_VE_PRED, B_HE_PRED };
enum { LEFT4X4 = 10, ABOVE4X4, ZERO4X4, NEW4X4 };
enum { CUR_FRAME = 0, LAST_FRAME, GOLDEN_FRAME, ALTREF_FRAME };

constexpr int8_t kImpliedBMode[4] = {B_DC_PRED, B_VE_PRED, B_HE_PRED, B_TM_PRED};

inline int16_t read_mv_component(BoolDecoder &bd, const uint8_t *probs) {
  /* macroblock.cc:197-229 */
  int x = 0;
  if (bd.get(probs[0])) { /* long */
    for (int i = 0; i < 3; i++) x += bd.get(probs[9 + i]) << i;
    for (int i = 9; i > 3; i--) x += bd.get(probs[9 + i]) << i;
    if (!(x & 0xFFF0) || bd.get(probs[9 + 3])) x += 8;
  } else {
    x = bd.tree(kSmallMvTree, probs + 2);
  }
  x <<= 1;
  if (x && bd.get(probs[1])) x = -x;
  return (int16_t)x;
}

struct MV {
  int16_t x, y;
  bool operator==(const MV &o) const { return x == o.x && y == o.y; }
  bool zero() const { return x == 0 && y == 0; }
};

inline MV read_mv(BoolDecoder &bd, const uint8_t *mv_probs) {
  MV mv;
  mv.y = read_mv_component(bd, mv_probs);       /* y first */
  mv.x = read_mv_component(bd, mv_probs + 19);
  return mv;
}

inline MV clamp_mv(MV mv, int c, int r, int C, int R) {
  const int to_left = -((c * 16) << 3) - 128;
  const int to_right = (((C - 1 - c) * 16) << 3) + 128;
  const int to_top = -((r * 16) << 3) - 128;
  const int to_bottom = (((R - 1 - r) * 16) << 3) + 128;
  int x = mv.x < to_left ? to_left : (mv.x > to_right ? to_right : mv.x);
  int y = mv.y < to_top ? to_top : (mv.y > to_bottom ? to_bottom : mv.y);
  return MV{(int16_t)x, (int16_t)y};
}

} // namespace

extern "C" {

/* Returns final bool-decoder position state packed into out_state[4]
 * (pos, range, value, bit_count), or -1 on error. */
int vp8_parse_mb_headers(
    const uint8_t *fp_data, int64_t fp_size,
    int64_t pos, uint32_t range_, uint32_t value, int bit_count,
    int mb_rows, int mb_cols, int key_frame,
    /* header params */
    int read_segment_id, const uint8_t *seg_tree_probs,
    int has_skip_prob, uint8_t prob_skip,
    uint8_t prob_inter, uint8_t prob_last, uint8_t prob_golden,
    int sign_bias_golden, int sign_bias_alt,
    const uint8_t *y_mode_probs, const uint8_t *uv_mode_probs,
    const uint8_t *kf_b_mode_probs /* 10*10*9 */,
    const uint8_t *mv_probs /* 2*19 */,
    /* outputs (caller-zeroed) */
    int8_t *ymode, int8_t *uvmode, int8_t *ref, int16_t *segment_update,
    uint8_t *skip, uint8_t *y2_coded, int8_t *bmode /* r*c*16 */,
    int16_t *sub_mv /* r*c*16*2 */, int16_t *uv_mv /* r*c*4*2 */,
    int8_t *splitmv_pid /* r*c, -1 default */,
    int64_t *out_state) {
  BoolDecoder bd;
  bd.data = fp_data;
  bd.size = fp_size;
  bd.pos = pos;
  bd.range_ = range_;
  bd.value = value;
  bd.bit_count = bit_count;

  const int R = mb_rows, C = mb_cols;
  int8_t *flipped = new int8_t[R * C]();
  int8_t *bmode_above = new int8_t[C * 4]();  /* B_DC_PRED = 0 */
  int8_t bmode_left[4];

  for (int r = 0; r < R; r++) {
    memset(bmode_left, B_DC_PRED, 4);
    for (int c = 0; c < C; c++) {
      const int mb = r * C + c;
      int8_t *mb_bmode = bmode + mb * 16;
      int16_t *mb_smv = sub_mv + mb * 32;

      if (read_segment_id)
        segment_update[mb] = (int16_t)bd.tree(kSegmentIdTree, seg_tree_probs);
      if (has_skip_prob) skip[mb] = (uint8_t)bd.get(prob_skip);

      if (key_frame) {
        const int ym = bd.tree(kKfYModeTree, kKfYModeProbs);
        ymode[mb] = (int8_t)ym;
        if (ym == B_PRED) {
          for (int sr = 0; sr < 4; sr++) {
            for (int sc = 0; sc < 4; sc++) {
              const int above = sr > 0 ? mb_bmode[(sr - 1) * 4 + sc]
                                       : bmode_above[c * 4 + sc];
              const int left = sc > 0 ? mb_bmode[sr * 4 + sc - 1]
                              : (c > 0 ? bmode[(mb - 1) * 16 + sr * 4 + 3]
                                       : bmode_left[sr]);
              mb_bmode[sr * 4 + sc] = (int8_t)bd.tree(
                  kBModeTree, kf_b_mode_probs + (above * 10 + left) * 9);
            }
          }
        } else {
          memset(mb_bmode, kImpliedBMode[ym], 16);
        }
        for (int i = 0; i < 4; i++) {
          bmode_above[c * 4 + i] = mb_bmode[12 + i];
          bmode_left[i] = mb_bmode[i * 4 + 3];
        }
        uvmode[mb] = (int8_t)bd.tree(kUvModeTree, kKfUvModeProbs);
        y2_coded[mb] = ym != B_PRED;
        continue;
      }

      /* interframe MB header */
      const int is_inter = bd.get(prob_inter);
      int rf = CUR_FRAME;
      if (is_inter) {
        if (bd.get(prob_last))
          rf = bd.get(prob_golden) ? ALTREF_FRAME : GOLDEN_FRAME;
        else
          rf = LAST_FRAME;
      }
      ref[mb] = (int8_t)rf;
      const int flip = (rf == GOLDEN_FRAME && sign_bias_golden) ||
                       (rf == ALTREF_FRAME && sign_bias_alt);
      flipped[mb] = (int8_t)flip;

      if (!is_inter) {
        const int ym = bd.tree(kYModeTree, y_mode_probs);
        ymode[mb] = (int8_t)ym;
        if (ym == B_PRED) {
          for (int i = 0; i < 16; i++)
            mb_bmode[i] = (int8_t)bd.tree(kBModeTree, kInvariantBModeProbs);
        } else {
          memset(mb_bmode, kImpliedBMode[ym], 16);
        }
        for (int i = 0; i < 4; i++) {
          bmode_above[c * 4 + i] = mb_bmode[12 + i];
          bmode_left[i] = mb_bmode[i * 4 + 3];
        }
        uvmode[mb] = (int8_t)bd.tree(kUvModeTree, uv_mode_probs);
        y2_coded[mb] = ym != B_PRED;
        continue;
      }

      /* census (scorer.hh:36-79) */
      uint8_t scores[4] = {0, 0, 0, 0};
      MV mvs[4] = {{0, 0}, {0, 0}, {0, 0}, {0, 0}};
      uint8_t splitmv_score = 0;
      int index = 0;
      auto add = [&](uint8_t score, int rr, int cc) {
        if (rr < 0 || cc < 0) return;
        const int nmb = rr * C + cc;
        if (ref[nmb] == CUR_FRAME) return;
        MV mv{sub_mv[nmb * 32 + 15 * 2], sub_mv[nmb * 32 + 15 * 2 + 1]};
        if (flipped[nmb] != flip) {
          mv.x = -mv.x;
          mv.y = -mv.y;
        }
        if (mv.zero()) {
          scores[0] += score;
        } else {
          if (!(mv == mvs[index])) {
            index++;
            mvs[index] = mv;
          }
          scores[index] += score;
        }
        if (ymode[nmb] == SPLITMV) splitmv_score += score;
      };
      add(2, r - 1, c);
      add(2, r, c - 1);
      add(1, r - 1, c - 1);
      if (scores[3]) {
        if (mvs[index] == mvs[1]) scores[1] += scores[3];
      }
      if (scores[2] > scores[1]) {
        uint8_t ts = scores[1]; scores[1] = scores[2]; scores[2] = ts;
        MV tm = mvs[1]; mvs[1] = mvs[2]; mvs[2] = tm;
      }
      if (scores[1] >= scores[0]) mvs[0] = mvs[1];

      const uint8_t mv_ref_probs[4] = {
          kMvCountsToProbs[scores[0]][0], kMvCountsToProbs[scores[1]][1],
          kMvCountsToProbs[scores[2]][2], kMvCountsToProbs[splitmv_score][3]};

      const int ym = bd.tree(kMvRefTree, mv_ref_probs);
      ymode[mb] = (int8_t)ym;
      y2_coded[mb] = ym != SPLITMV;

      MV base{0, 0};
      bool have_base = true;
      switch (ym) {
        case NEARESTMV: base = clamp_mv(mvs[1], c, r, C, R); break;
        case NEARMV: base = clamp_mv(mvs[2], c, r, C, R); break;
        case ZEROMV: break;
        case NEWMV: {
          MV d = read_mv(bd, mv_probs);
          MV cb = clamp_mv(mvs[0], c, r, C, R);
          base = MV{(int16_t)(d.x + cb.x), (int16_t)(d.y + cb.y)};
          break;
        }
        case SPLITMV: {
          have_base = false;
          const int pid = bd.tree(kSplitMvTree, kSplitMvProbs);
          splitmv_pid[mb] = (int8_t)pid;
          const MvPartition &scheme = kMvPartitions[pid];
          const MV best = clamp_mv(mvs[0], c, r, C, R);
          int done[16] = {0};
          for (int sb = 0; sb < 16; sb++) {
            const int part = scheme.part_of[sb];
            if (done[part]) {
              /* copy from the partition's first subblock */
              continue;
            }
            done[part] = 1;
            const int sr = sb / 4, sc = sb % 4;
            MV left, above;
            if (sc > 0)
              left = MV{mb_smv[(sr * 4 + sc - 1) * 2],
                        mb_smv[(sr * 4 + sc - 1) * 2 + 1]};
            else if (c > 0)
              left = MV{sub_mv[(mb - 1) * 32 + (sr * 4 + 3) * 2],
                        sub_mv[(mb - 1) * 32 + (sr * 4 + 3) * 2 + 1]};
            else
              left = MV{0, 0};
            if (sr > 0)
              above = MV{mb_smv[((sr - 1) * 4 + sc) * 2],
                         mb_smv[((sr - 1) * 4 + sc) * 2 + 1]};
            else if (r > 0)
              above = MV{sub_mv[(mb - C) * 32 + (12 + sc) * 2],
                         sub_mv[(mb - C) * 32 + (12 + sc) * 2 + 1]};
            else
              above = MV{0, 0};

            int ctx;
            if (left == above && left.zero()) ctx = 4;
            else if (left == above) ctx = 3;
            else if (above.zero()) ctx = 2;
            else if (left.zero()) ctx = 1;
            else ctx = 0;

            const int sm = bd.tree(kSubmvRefTree, kSubmvRefProbs2[ctx]);
            MV mv;
            switch (sm) {
              case LEFT4X4: mv = left; break;
              case ABOVE4X4: mv = above; break;
              case ZERO4X4: mv = MV{0, 0}; break;
              default: { /* NEW4X4 */
                MV d = read_mv(bd, mv_probs);
                mv = MV{(int16_t)(d.x + best.x), (int16_t)(d.y + best.y)};
              }
            }
            /* write to every subblock of this partition */
            for (int k = 0; k < 16; k++) {
              if (scheme.part_of[k] == part) {
                mb_bmode[k] = (int8_t)sm;
                mb_smv[k * 2] = mv.x;
                mb_smv[k * 2 + 1] = mv.y;
              }
            }
          }
          break;
        }
        default:
          delete[] flipped;
          delete[] bmode_above;
          return -1;
      }

      if (have_base) {
        for (int k = 0; k < 16; k++) {
          mb_smv[k * 2] = base.x;
          mb_smv[k * 2 + 1] = base.y;
        }
        memset(mb_bmode, 0, 16);
      }

      /* chroma MVs (macroblock.cc:289-299, 446-455) */
      for (int ur = 0; ur < 2; ur++) {
        for (int uc = 0; uc < 2; uc++) {
          int sx = 0, sy = 0;
          const int idx[4] = {(ur * 2) * 4 + uc * 2, (ur * 2) * 4 + uc * 2 + 1,
                              (ur * 2 + 1) * 4 + uc * 2,
                              (ur * 2 + 1) * 4 + uc * 2 + 1};
          for (int k = 0; k < 4; k++) {
            sx += mb_smv[idx[k] * 2];
            sy += mb_smv[idx[k] * 2 + 1];
          }
          const int cx = sx >= 0 ? (sx + 4) >> 3 : -((-sx + 4) >> 3);
          const int cy = sy >= 0 ? (sy + 4) >> 3 : -((-sy + 4) >> 3);
          uv_mv[(mb * 4 + ur * 2 + uc) * 2] = (int16_t)cx;
          uv_mv[(mb * 4 + ur * 2 + uc) * 2 + 1] = (int16_t)cy;
        }
      }
    }
  }

  delete[] flipped;
  delete[] bmode_above;
  out_state[0] = bd.pos;
  out_state[1] = bd.range_;
  out_state[2] = bd.value;
  out_state[3] = bd.bit_count;
  return 0;
}

} // extern "C"
