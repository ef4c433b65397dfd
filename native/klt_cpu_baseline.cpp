// Faithful single-thread CPU baseline of the reference's fast-mode
// pyramidal KLT (reference algorithm: src/optical_flow_tracker/basic_klt/
// optical_flow_basic_klt_fast.cpp:7-195 + optical_flow.cpp:49-124, as
// documented in SURVEY.md §2.1). Written from the algorithm spec, not the
// reference sources; float32 arithmetic throughout so it doubles as the
// ground-truth generator for exact-count parity fixtures
// (tests/test_reference_integration.py) and as the measured Eigen-class
// CPU baseline for bench.py's vs_baseline column.
//
// Per feature, coarse-to-fine over the pyramid:
//   1. extract the extended reference patch (patch + 1px gradient border)
//      with ONE set of bilinear weights (the patch is rigidly offset from
//      the feature point) and an analytic validity mask (anchors within
//      [0, dim-2]),
//   2. central-difference gradients + the constant 2x2 Hessian,
//   3. iterate: bilinear-resample the current patch, residual dt,
//      b -= J^T dt, closed-form 2x2 solve, convergence / divergence /
//      NaN checks with the reference's exact break semantics.
//
// C ABI only (consumed via ctypes; no Python headers).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int8_t kNotTracked = 0;
constexpr int8_t kTracked = 1;
constexpr int8_t kLargeResidual = 2;
constexpr int8_t kOutside = 3;
constexpr int8_t kNumericError = 4;

constexpr int kMaxPatch = 64;  // max extended patch side supported

struct Level {
    const float* img;
    int h;
    int w;
};

// Bilinear 4-tap weights shared by the whole (rigidly offset) patch.
struct Taps {
    int r0, c0;
    float w_tl, w_tr, w_bl, w_br;
};

inline Taps make_taps(float x, float y) {
    Taps t;
    float fr0 = std::floor(y);
    float fc0 = std::floor(x);
    t.r0 = static_cast<int>(fr0);
    t.c0 = static_cast<int>(fc0);
    float fr = y - fr0;
    float fc = x - fc0;
    t.w_tl = (1.0f - fr) * (1.0f - fc);
    t.w_tr = (1.0f - fr) * fc;
    t.w_bl = fr * (1.0f - fc);
    t.w_br = fr * fc;
    return t;
}

inline bool tap_valid(int r, int c, int h, int w) {
    // Anchor within [0, dim-2]: the +1 bilinear taps must stay inside
    // (reference bound, optical_flow.cpp:68,73).
    return r >= 0 && r <= h - 2 && c >= 0 && c <= w - 2;
}

inline float sample(const Level& L, const Taps& t, int r, int c) {
    const float* p = L.img + r * L.w + c;
    return t.w_tl * p[0] + t.w_tr * p[1] + t.w_bl * p[L.w]
         + t.w_br * p[L.w + 1];
}

}  // namespace

extern "C" {

// Track n features through a `levels`-deep pyramid (level 0 = finest).
// imgs are row-major float32; uv arrays are [n, 2] as (x, y) i.e.
// (col, row). cur_uv holds the prediction on input and the result on
// output; status is rewritten per feature (fast mode). Features whose
// incoming status is > kTracked, or whose index >= max_track_points, are
// skipped untouched.
void ftk_klt_fast_pyramid(const float** ref_imgs, const float** cur_imgs,
                          const int* hs, const int* ws, int levels,
                          const float* ref_uv, float* cur_uv,
                          int8_t* status, int n, int max_track_points,
                          int patch_half_r, int patch_half_c, int max_iter,
                          int max_tolerance_large_step,
                          float max_converge_step) {
    const int pr = 2 * patch_half_r + 1;
    const int pc = 2 * patch_half_c + 1;
    const int epr = pr + 2;
    const int epc = pc + 2;
    if (epr > kMaxPatch || epc > kMaxPatch) return;

    float ex_patch[kMaxPatch][kMaxPatch];
    bool ex_valid[kMaxPatch][kMaxPatch];
    float dx[kMaxPatch][kMaxPatch];
    float dy[kMaxPatch][kMaxPatch];

    Level ref_lv[16], cur_lv[16];
    for (int l = 0; l < levels; ++l) {
        ref_lv[l] = {ref_imgs[l], hs[l], ws[l]};
        cur_lv[l] = {cur_imgs[l], hs[l], ws[l]};
    }

    const float coarse = 1.0f / static_cast<float>(1 << (levels - 1));
    const int h0 = hs[0], w0 = ws[0];

    for (int f = 0; f < n; ++f) {
        if (f >= max_track_points) continue;
        if (status[f] > kTracked) continue;  // failed earlier: skip

        float rx = ref_uv[2 * f] * coarse;
        float ry = ref_uv[2 * f + 1] * coarse;
        float x = cur_uv[2 * f] * coarse;
        float y = cur_uv[2 * f + 1] * coarse;
        int8_t st = status[f];

        for (int lvl = levels - 1; lvl >= 0; --lvl) {
            const Level& R = ref_lv[lvl];
            const Level& C = cur_lv[lvl];

            // --- reference setup: extended patch + gradients + Hessian
            // (non-finite anchors behave like the jnp path's saturated
            // int casts: every tap invalid)
            bool finite_ref = std::isfinite(rx) && std::isfinite(ry);
            Taps rt = make_taps(finite_ref ? rx : 0.0f,
                                finite_ref ? ry : 0.0f);
            int min_r = rt.r0 - epr / 2;
            int min_c = rt.c0 - epc / 2;
            int n_valid_ref = 0;
            for (int i = 0; i < epr; ++i) {
                for (int j = 0; j < epc; ++j) {
                    bool ok = finite_ref
                           && tap_valid(min_r + i, min_c + j, R.h, R.w);
                    ex_valid[i][j] = ok;
                    ex_patch[i][j] =
                        ok ? sample(R, rt, min_r + i, min_c + j) : 0.0f;
                    n_valid_ref += ok;
                }
            }
            bool no_pixels = n_valid_ref == 0;
            st = no_pixels ? kOutside : kLargeResidual;

            float h00 = 0.0f, h01 = 0.0f, h11 = 0.0f;
            for (int i = 0; i < pr; ++i) {
                for (int j = 0; j < pc; ++j) {
                    bool g = ex_valid[i + 1][j] && ex_valid[i + 1][j + 2]
                          && ex_valid[i][j + 1] && ex_valid[i + 2][j + 1];
                    float gx = g ? ex_patch[i + 1][j + 2]
                                 - ex_patch[i + 1][j] : 0.0f;
                    float gy = g ? ex_patch[i + 2][j + 1]
                                 - ex_patch[i][j + 1] : 0.0f;
                    dx[i][j] = gx;
                    dy[i][j] = gy;
                    h00 += gx * gx;
                    h01 += gx * gy;
                    h11 += gy * gy;
                }
            }
            const float det = h00 * h11 - h01 * h01;

            // --- iterate: resample + bias + 2x2 solve, exact break
            //     semantics of the masked scaffold (engine.py).
            float last_sq = INFINITY;
            int large_cnt = 0;
            bool done = no_pixels;
            for (int it = 0; it < max_iter && !done; ++it) {
                if (!(std::isfinite(x) && std::isfinite(y))) break;
                Taps ct = make_taps(x, y);
                int cmin_r = ct.r0 - pr / 2;
                int cmin_c = ct.c0 - pc / 2;
                float b0 = 0.0f, b1 = 0.0f;
                int num_valid = 0;
                for (int i = 0; i < pr; ++i) {
                    for (int j = 0; j < pc; ++j) {
                        bool ok = ex_valid[i + 1][j + 1]
                               && tap_valid(cmin_r + i, cmin_c + j, C.h,
                                            C.w);
                        if (!ok) continue;
                        float dt = sample(C, ct, cmin_r + i, cmin_c + j)
                                 - ex_patch[i + 1][j + 1];
                        b0 -= dx[i][j] * dt;
                        b1 -= dy[i][j] * dt;
                        ++num_valid;
                    }
                }
                if (num_valid == 0) break;  // state & status unchanged
                float vx = (h11 * b0 - h01 * b1) / det;
                float vy = (h00 * b1 - h01 * b0) / det;
                if (std::isnan(vx) || std::isnan(vy)) {
                    st = kNumericError;
                    break;
                }
                x += vx;
                y += vy;
                float sq = vx * vx + vy * vy;
                if (sq < last_sq) {
                    last_sq = sq;
                    large_cnt = 0;
                } else if (++large_cnt >= max_tolerance_large_step) {
                    break;  // diverged: status stays kLargeResidual
                }
                if (sq < max_converge_step) {
                    st = kTracked;
                    break;
                }
            }

            if (lvl > 0) {
                rx *= 2.0f;
                ry *= 2.0f;
                x *= 2.0f;
                y *= 2.0f;
            }
        }

        // Final full-resolution outside check (bounds dim-1).
        if (x < 0.0f || x > static_cast<float>(w0 - 1) || y < 0.0f
            || y > static_cast<float>(h0 - 1)) {
            st = kOutside;
        }
        cur_uv[2 * f] = x;
        cur_uv[2 * f + 1] = y;
        status[f] = st;
    }
}

}  // extern "C"
