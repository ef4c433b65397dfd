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
#include <algorithm>
#include <vector>

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

// Unrolled Cholesky solve of a small SPD system (row-major lower half
// used). Mirrors the Pallas kernels' scalar Cholesky (pallas_warp_klt.py
// _chol_solve) so the ground truth pins the production float path: NaN
// propagates out of sqrt/division for non-SPD H exactly like the kernel.
template <int N>
inline void chol_solve(const float (&h)[N][N], const float (&b)[N],
                       float (&x)[N]) {
    float low[N][N];
    for (int i = 0; i < N; ++i) {
        for (int j = 0; j <= i; ++j) {
            float acc = h[i][j];
            for (int k = 0; k < j; ++k) acc -= low[i][k] * low[j][k];
            low[i][j] = (i == j) ? std::sqrt(acc) : acc / low[j][j];
        }
    }
    float y[N];
    for (int i = 0; i < N; ++i) {
        float acc = b[i];
        for (int k = 0; k < i; ++k) acc -= low[i][k] * y[k];
        y[i] = acc / low[i][i];
    }
    for (int i = N - 1; i >= 0; --i) {
        float acc = y[i];
        for (int k = i + 1; k < N; ++k) acc -= low[k][i] * x[k];
        x[i] = acc / low[i][i];
    }
}

// Shared per-level reference setup for the warp trackers: extended patch,
// validity, un-halved central-difference gradients, valid count.
// (reference algorithm: optical_flow.cpp:49-124; same contract as the
// basic port above.)
struct RefSetup {
    float ex_patch[kMaxPatch][kMaxPatch];
    bool ex_valid[kMaxPatch][kMaxPatch];
    float dx[kMaxPatch][kMaxPatch];
    float dy[kMaxPatch][kMaxPatch];
    int n_valid_ref;
};

inline void ref_setup(const Level& R, float rx, float ry, int pr, int pc,
                      RefSetup* s) {
    const int epr = pr + 2;
    const int epc = pc + 2;
    bool finite_ref = std::isfinite(rx) && std::isfinite(ry);
    Taps rt = make_taps(finite_ref ? rx : 0.0f, finite_ref ? ry : 0.0f);
    int min_r = rt.r0 - epr / 2;
    int min_c = rt.c0 - epc / 2;
    s->n_valid_ref = 0;
    for (int i = 0; i < epr; ++i) {
        for (int j = 0; j < epc; ++j) {
            bool ok = finite_ref
                   && tap_valid(min_r + i, min_c + j, R.h, R.w);
            s->ex_valid[i][j] = ok;
            s->ex_patch[i][j] =
                ok ? sample(R, rt, min_r + i, min_c + j) : 0.0f;
            s->n_valid_ref += ok;
        }
    }
    for (int i = 0; i < pr; ++i) {
        for (int j = 0; j < pc; ++j) {
            bool g = s->ex_valid[i + 1][j] && s->ex_valid[i + 1][j + 2]
                  && s->ex_valid[i][j + 1] && s->ex_valid[i + 2][j + 1];
            s->dx[i][j] = g ? s->ex_patch[i + 1][j + 2]
                            - s->ex_patch[i + 1][j] : 0.0f;
            s->dy[i][j] = g ? s->ex_patch[i + 2][j + 1]
                            - s->ex_patch[i][j + 1] : 0.0f;
        }
    }
}

// Per-pixel bounds-checked bilinear sample of the current image (the warp
// trackers sample at per-pixel warped positions, so the constant-weight
// trick does not apply; reference: affine_klt_fast.cpp:150-152).
inline bool warp_sample(const Level& C, float x, float y, float* out) {
    if (!(std::isfinite(x) && std::isfinite(y))) return false;
    float fr0 = std::floor(y);
    float fc0 = std::floor(x);
    int r0 = static_cast<int>(fr0);
    int c0 = static_cast<int>(fc0);
    if (!tap_valid(r0, c0, C.h, C.w)) return false;
    float fr = y - fr0;
    float fc = x - fc0;
    const float* p = C.img + r0 * C.w + c0;
    *out = (1.0f - fr) * (1.0f - fc) * p[0] + (1.0f - fr) * fc * p[1]
         + fr * (1.0f - fc) * p[C.w] + fr * fc * p[C.w + 1];
    return true;
}

}  // namespace

extern "C" {

// Track n features through a `levels`-deep pyramid (level 0 = finest).
// imgs are row-major float32; uv arrays are [n, 2] as (x, y) i.e.
// (col, row). cur_uv holds the prediction on input and the result on
// output; status is rewritten per feature (fast mode). Features whose
// incoming status is > kTracked, or whose index >= max_track_points, are
// skipped untouched.
int ftk_klt_fast_pyramid(const float** ref_imgs, const float** cur_imgs,
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
    if (epr > kMaxPatch || epc > kMaxPatch || levels < 1 ||
        levels > 16) return 1;

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
    return 0;
}

// Affine-warp fast-mode pyramidal KLT (reference algorithm:
// src/optical_flow_tracker/affine_klt/optical_flow_affine_klt_fast.cpp:
// 7-137 as documented in SURVEY.md §2.1; same equilibrated-Cholesky float
// path as ops/pallas_warp_klt.py::_affine_kernel). The affine matrix
// starts at identity once per call and persists across levels
// (affine_klt.cpp:20); positions scale x2 between levels, A does not.
int ftk_klt_affine_fast_pyramid(
        const float** ref_imgs, const float** cur_imgs,
        const int* hs, const int* ws, int levels,
        const float* ref_uv, float* cur_uv, int8_t* status,
        int n, int max_track_points,
        int patch_half_r, int patch_half_c, int max_iter,
        int max_tolerance_large_step, float max_converge_step) {
    const int pr = 2 * patch_half_r + 1;
    const int pc = 2 * patch_half_c + 1;
    if (pr + 2 > kMaxPatch || pc + 2 > kMaxPatch || levels < 1 ||
        levels > 16) return 1;

    Level ref_lv[16], cur_lv[16];
    for (int l = 0; l < levels; ++l) {
        ref_lv[l] = {ref_imgs[l], hs[l], ws[l]};
        cur_lv[l] = {cur_imgs[l], hs[l], ws[l]};
    }
    const float coarse = 1.0f / static_cast<float>(1 << (levels - 1));
    const int h0 = hs[0], w0 = ws[0];
    RefSetup S;

    for (int f = 0; f < n; ++f) {
        if (f >= max_track_points) continue;
        if (status[f] > kTracked) continue;

        float rx = ref_uv[2 * f] * coarse;
        float ry = ref_uv[2 * f + 1] * coarse;
        float x = cur_uv[2 * f] * coarse;
        float y = cur_uv[2 * f + 1] * coarse;
        float c00 = 1.0f, c01 = 0.0f, c10 = 0.0f, c11 = 1.0f;
        int8_t st = status[f];

        for (int lvl = levels - 1; lvl >= 0; --lvl) {
            const Level& R = ref_lv[lvl];
            const Level& C = cur_lv[lvl];
            ref_setup(R, rx, ry, pr, pc, &S);
            bool no_pixels = S.n_valid_ref == 0;
            st = no_pixels ? kOutside : kLargeResidual;

            // H precomputed once per level with x,y anchored at the
            // level-entry position (affine_klt_fast.cpp:95-137),
            // equilibrated by the coordinate scale like the Pallas
            // kernel: solve (DHD)w = Db, z = Dw.
            const float x_ent = x, y_ent = y;
            float scl = std::fmax(std::fmax(std::fabs(x_ent),
                                            std::fabs(y_ent)), 1.0f);
            float dvec[6] = {1.0f / scl, 1.0f / scl, 1.0f / scl,
                             1.0f / scl, 1.0f, 1.0f};
            float hess[6][6] = {};
            for (int i = 0; i < pr; ++i) {
                for (int j = 0; j < pc; ++j) {
                    float gx = S.dx[i][j];
                    float gy = S.dy[i][j];
                    float xo = static_cast<float>(j - pc / 2) + x_ent;
                    float yo = static_cast<float>(i - pr / 2) + y_ent;
                    float j6[6] = {xo * gx, xo * gy, yo * gx, yo * gy,
                                   gx, gy};
                    for (int a = 0; a < 6; ++a)
                        for (int b = 0; b <= a; ++b)
                            hess[a][b] += j6[a] * j6[b];
                }
            }
            for (int a = 0; a < 6; ++a)
                for (int b = 0; b <= a; ++b) {
                    hess[a][b] *= dvec[a] * dvec[b];
                    hess[b][a] = hess[a][b];
                }

            float last_sq = INFINITY;
            int large_cnt = 0;
            bool done = no_pixels;
            for (int it = 0; it < max_iter && !done; ++it) {
                float b6[6] = {};
                int num_valid = 0;
                for (int i = 0; i < pr; ++i) {
                    for (int j = 0; j < pc; ++j) {
                        if (!S.ex_valid[i + 1][j + 1]) continue;
                        float xo = static_cast<float>(j - pc / 2);
                        float yo = static_cast<float>(i - pr / 2);
                        float wx = c00 * xo + c01 * yo + x;
                        float wy = c10 * xo + c11 * yo + y;
                        float curv;
                        if (!warp_sample(C, wx, wy, &curv)) continue;
                        float dt = curv - S.ex_patch[i + 1][j + 1];
                        b6[0] -= dt * wx * S.dx[i][j];
                        b6[1] -= dt * wx * S.dy[i][j];
                        b6[2] -= dt * wy * S.dx[i][j];
                        b6[3] -= dt * wy * S.dy[i][j];
                        b6[4] -= dt * S.dx[i][j];
                        b6[5] -= dt * S.dy[i][j];
                        ++num_valid;
                    }
                }
                if (num_valid == 0) break;
                float beq[6], w6[6], z[6];
                for (int a = 0; a < 6; ++a) beq[a] = b6[a] * dvec[a];
                chol_solve<6>(hess, beq, w6);
                for (int a = 0; a < 6; ++a) z[a] = w6[a] * dvec[a];
                float vx = z[0] * x + z[2] * y + z[4];
                float vy = z[1] * x + z[3] * y + z[5];
                if (std::isnan(vx) || std::isnan(vy)) {
                    st = kNumericError;
                    break;
                }
                x += vx;
                y += vy;
                c00 += z[0];
                c01 += z[2];
                c10 += z[1];
                c11 += z[3];
                float sq = vx * vx + vy * vy;
                if (sq < last_sq) {
                    last_sq = sq;
                    large_cnt = 0;
                } else if (++large_cnt >= max_tolerance_large_step) {
                    break;
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

        if (x < 0.0f || x > static_cast<float>(w0 - 1) || y < 0.0f
            || y > static_cast<float>(h0 - 1)) {
            st = kOutside;
        }
        cur_uv[2 * f] = x;
        cur_uv[2 * f + 1] = y;
        status[f] = st;
    }
    return 0;
}

// Direct photometric SE(3) pose tracker, DIRECT mode (reference
// algorithm: src/direct_method_tracker/direct_method_tracker.cpp:35-192
// as documented in SURVEY.md §2.1; float path mirrors
// trackers/direct.py::_track_level). Joint Gauss-Newton over all feature
// patches into ONE 6x6 system per iteration; additive position update and
// left-multiplied small-angle quaternion update
// (direct_method_tracker.cpp:179-185).
int ftk_direct_method_pyramid(
        const float** ref_imgs, const float** cur_imgs,
        const int* hs, const int* ws, int levels,
        const float* k4_full,      // fx, fy, cx, cy at full resolution
        const float* p_ref,        // [n, 3] points in the reference frame
        const float* ref_uv,       // [n, 2]
        float* cur_uv,             // in: prediction; out: reprojection
        float* q_rc,               // [4] (w, x, y, z) in/out
        float* p_rc,               // [3] in/out
        int8_t* status,            // [n] out
        int n, int max_track_points,
        int patch_half_r, int patch_half_c, int max_iter,
        float max_converge_step) {
    const int pr = 2 * patch_half_r + 1;
    const int pc = 2 * patch_half_c + 1;
    if (pr > kMaxPatch || pc > kMaxPatch || n > 4096 ||
        levels < 1 || levels > 16) return 1;

    Level ref_lv[16], cur_lv[16];
    for (int l = 0; l < levels; ++l) {
        ref_lv[l] = {ref_imgs[l], hs[l], ws[l]};
        cur_lv[l] = {cur_imgs[l], hs[l], ws[l]};
    }
    const float coarse = 1.0f / static_cast<float>(1 << (levels - 1));
    float q[4] = {q_rc[0], q_rc[1], q_rc[2], q_rc[3]};
    float t[3] = {p_rc[0], p_rc[1], p_rc[2]};
    const float eps_z = 1e-6f;

    // Scratch: per-feature reference patches (per level).
    static thread_local float refv[4096][kMaxPatch * kMaxPatch];
    static thread_local bool okref[4096][kMaxPatch * kMaxPatch];

    float sk[4] = {k4_full[0] * coarse, k4_full[1] * coarse,
                   k4_full[2] * coarse, k4_full[3] * coarse};

    auto rotate = [&](const float qq[4], const float v[3], float out[3]) {
        // v + 2*(w*(u x v) + u x (u x v))
        float ux = qq[1], uy = qq[2], uz = qq[3], w = qq[0];
        float c1x = uy * v[2] - uz * v[1];
        float c1y = uz * v[0] - ux * v[2];
        float c1z = ux * v[1] - uy * v[0];
        float c2x = uy * c1z - uz * c1y;
        float c2y = uz * c1x - ux * c1z;
        float c2z = ux * c1y - uy * c1x;
        out[0] = v[0] + 2.0f * (w * c1x + c2x);
        out[1] = v[1] + 2.0f * (w * c1y + c2y);
        out[2] = v[2] + 2.0f * (w * c1z + c2z);
    };

    for (int lvl = levels - 1; lvl >= 0; --lvl) {
        const Level& R = ref_lv[lvl];
        const Level& C = cur_lv[lvl];
        const float fx = sk[0], fy = sk[1], cx = sk[2], cy = sk[3];
        const float lscale = coarse * static_cast<float>(1 << (levels - 1 - lvl));

        // Reference patches at this level (const-weight, rigid offset).
        for (int f = 0; f < n; ++f) {
            float rx = ref_uv[2 * f] * lscale;
            float ry = ref_uv[2 * f + 1] * lscale;
            bool fin = std::isfinite(rx) && std::isfinite(ry);
            Taps rt = make_taps(fin ? rx : 0.0f, fin ? ry : 0.0f);
            int min_r = rt.r0 - pr / 2;
            int min_c = rt.c0 - pc / 2;
            for (int i = 0; i < pr; ++i)
                for (int j = 0; j < pc; ++j) {
                    bool ok = fin && tap_valid(min_r + i, min_c + j,
                                               R.h, R.w);
                    okref[f][i * pc + j] = ok;
                    refv[f][i * pc + j] =
                        ok ? sample(R, rt, min_r + i, min_c + j) : 0.0f;
                }
        }

        bool done = false;
        for (int it = 0; it < max_iter && !done; ++it) {
            float hess[6][6] = {};
            float bias[6] = {};
            for (int f = 0; f < n && f < max_track_points; ++f) {
                const float pf[3] = {p_ref[3 * f], p_ref[3 * f + 1],
                                     p_ref[3 * f + 2]};
                if (!(pf[2] >= eps_z)) continue;
                // p_cur = R(q)^-1 (p_ref - t)
                float d[3] = {pf[0] - t[0], pf[1] - t[1], pf[2] - t[2]};
                float qc[4] = {q[0], -q[1], -q[2], -q[3]};
                float pcur[3];
                rotate(qc, d, pcur);
                if (!(pcur[2] >= eps_z)) continue;
                float u = fx * pcur[0] / pcur[2] + cx;
                float v = fy * pcur[1] / pcur[2] + cy;
                cur_uv[2 * f] = u;
                cur_uv[2 * f + 1] = v;

                if (!(std::isfinite(u) && std::isfinite(v))) continue;
                // 2x6 d(pixel)/d(xi) from the REFERENCE-frame point
                // (direct_method_tracker.cpp:148-151).
                float zi = 1.0f / pf[2];
                float zi2 = zi * zi;
                float X = pf[0], Y = pf[1];
                float j0[6] = {fx * zi, 0.0f, -fx * X * zi2,
                               -fx * X * Y * zi2, fx + fx * X * X * zi2,
                               -fx * Y * zi};
                float j1[6] = {0.0f, fy * zi, -fy * Y * zi2,
                               -fy - fy * Y * Y * zi2, fy * X * Y * zi2,
                               fy * X * zi};

                Taps ct = make_taps(u, v);
                int min_r = ct.r0 - pr / 2;
                int min_c = ct.c0 - pc / 2;
                for (int i = 0; i < pr; ++i) {
                    for (int j = 0; j < pc; ++j) {
                        int rr = min_r + i, cc = min_c + j;
                        if (!okref[f][i * pc + j]) continue;
                        if (!tap_valid(rr, cc, C.h, C.w)) continue;
                        // 0.5-scaled central differences of the CURRENT
                        // image with per-shift validity.
                        if (!(tap_valid(rr, cc - 1, C.h, C.w)
                              && tap_valid(rr, cc + 1, C.h, C.w)
                              && tap_valid(rr - 1, cc, C.h, C.w)
                              && tap_valid(rr + 1, cc, C.h, C.w)))
                            continue;
                        float cv = sample(C, ct, rr, cc);
                        float gx = 0.5f * (sample(C, ct, rr, cc + 1)
                                           - sample(C, ct, rr, cc - 1));
                        float gy = 0.5f * (sample(C, ct, rr + 1, cc)
                                           - sample(C, ct, rr - 1, cc));
                        float res = cv - refv[f][i * pc + j];
                        float jrow[6];
                        for (int a = 0; a < 6; ++a)
                            jrow[a] = gx * j0[a] + gy * j1[a];
                        for (int a = 0; a < 6; ++a) {
                            bias[a] += res * jrow[a];
                            for (int b = 0; b <= a; ++b)
                                hess[a][b] += jrow[a] * jrow[b];
                        }
                    }
                }
            }
            for (int a = 0; a < 6; ++a)
                for (int b = a + 1; b < 6; ++b)
                    hess[a][b] = hess[b][a];
            float dx[6];
            chol_solve<6>(hess, bias, dx);
            bool isnan = false;
            float sq = 0.0f;
            for (int a = 0; a < 6; ++a) {
                isnan = isnan || std::isnan(dx[a]);
                sq += dx[a] * dx[a];
            }
            if (!isnan) {
                t[0] += dx[0];
                t[1] += dx[1];
                t[2] += dx[2];
                float dq[4] = {1.0f, 0.5f * dx[3], 0.5f * dx[4],
                               0.5f * dx[5]};
                float nrm = std::sqrt(dq[0] * dq[0] + dq[1] * dq[1]
                                      + dq[2] * dq[2] + dq[3] * dq[3]);
                for (int a = 0; a < 4; ++a) dq[a] /= nrm;
                float nq[4] = {
                    dq[0] * q[0] - dq[1] * q[1] - dq[2] * q[2]
                        - dq[3] * q[3],
                    dq[0] * q[1] + dq[1] * q[0] + dq[2] * q[3]
                        - dq[3] * q[2],
                    dq[0] * q[2] - dq[1] * q[3] + dq[2] * q[0]
                        + dq[3] * q[1],
                    dq[0] * q[3] + dq[1] * q[2] - dq[2] * q[1]
                        + dq[3] * q[0]};
                float qn = std::sqrt(nq[0] * nq[0] + nq[1] * nq[1]
                                     + nq[2] * nq[2] + nq[3] * nq[3]);
                for (int a = 0; a < 4; ++a) q[a] = nq[a] / qn;
            }
            done = isnan || sq < max_converge_step;
        }

        if (lvl > 0) {
            sk[0] *= 2.0f;
            sk[1] *= 2.0f;
            sk[2] *= 2.0f;
            sk[3] *= 2.0f;
        }
    }

    const int h0 = hs[0], w0 = ws[0];
    for (int f = 0; f < n; ++f) {
        float u = cur_uv[2 * f], v = cur_uv[2 * f + 1];
        status[f] = (u < 0.0f || u > static_cast<float>(w0 - 1)
                     || v < 0.0f || v > static_cast<float>(h0 - 1))
                        ? kOutside : kTracked;
    }
    q_rc[0] = q[0];
    q_rc[1] = q[1];
    q_rc[2] = q[2];
    q_rc[3] = q[3];
    p_rc[0] = t[0];
    p_rc[1] = t[1];
    p_rc[2] = t[2];
    return 0;
}

// SE(2) (LSSD) fast-mode pyramidal KLT (reference algorithm:
// src/optical_flow_tracker/lssd_klt/optical_flow_lssd_klt_fast.cpp as
// documented in SURVEY.md §2.1; float path mirrors
// ops/pallas_warp_klt.py::_lssd_kernel). t_cr initializes from the
// prediction at the coarsest level (lssd_klt.cpp:22-23), only t scales
// between levels (lssd_klt.cpp:49), and the final position is
// R_cr @ ref_uv + t_cr at full resolution (lssd_klt.cpp:43).
int ftk_klt_lssd_fast_pyramid(
        const float** ref_imgs, const float** cur_imgs,
        const int* hs, const int* ws, int levels,
        const float* ref_uv, float* cur_uv, int8_t* status,
        int n, int max_track_points,
        int patch_half_r, int patch_half_c, int max_iter,
        int max_tolerance_large_step, float max_converge_step,
        int luminance) {
    const int pr = 2 * patch_half_r + 1;
    const int pc = 2 * patch_half_c + 1;
    if (pr + 2 > kMaxPatch || pc + 2 > kMaxPatch || levels < 1 ||
        levels > 16) return 1;

    Level ref_lv[16], cur_lv[16];
    for (int l = 0; l < levels; ++l) {
        ref_lv[l] = {ref_imgs[l], hs[l], ws[l]};
        cur_lv[l] = {cur_imgs[l], hs[l], ws[l]};
    }
    const float coarse = 1.0f / static_cast<float>(1 << (levels - 1));
    const int h0 = hs[0], w0 = ws[0];
    RefSetup S;
    float inner[kMaxPatch][kMaxPatch];

    for (int f = 0; f < n; ++f) {
        if (f >= max_track_points) continue;
        if (status[f] > kTracked) continue;

        float rx = ref_uv[2 * f] * coarse;
        float ry = ref_uv[2 * f + 1] * coarse;
        // rot = identity prediction; t = prediction - R @ ref (scaled).
        float c00 = 1.0f, c01 = 0.0f, c10 = 0.0f, c11 = 1.0f;
        float cx = cur_uv[2 * f] * coarse - rx;
        float cy = cur_uv[2 * f + 1] * coarse - ry;
        int8_t st = status[f];

        for (int lvl = levels - 1; lvl >= 0; --lvl) {
            const Level& R = ref_lv[lvl];
            const Level& C = cur_lv[lvl];
            ref_setup(R, rx, ry, pr, pc, &S);
            bool no_pixels = S.n_valid_ref == 0;
            st = no_pixels ? kOutside : kLargeResidual;

            float ref_mean = 1.0f;
            if (luminance) {
                // Sum over the inner patch / count over the whole
                // extended patch (lssd_klt_fast.cpp:29-36).
                float acc = 0.0f;
                for (int i = 0; i < pr; ++i)
                    for (int j = 0; j < pc; ++j)
                        acc += S.ex_valid[i + 1][j + 1]
                                   ? S.ex_patch[i + 1][j + 1] : 0.0f;
                ref_mean = acc / static_cast<float>(
                    S.n_valid_ref > 0 ? S.n_valid_ref : 1);
            }
            for (int i = 0; i < pr; ++i) {
                for (int j = 0; j < pc; ++j) {
                    S.dx[i][j] /= ref_mean;
                    S.dy[i][j] /= ref_mean;
                    inner[i][j] = S.ex_patch[i + 1][j + 1] / ref_mean;
                }
            }

            float last_sq = INFINITY;
            int large_cnt = 0;
            bool done = no_pixels;
            for (int it = 0; it < max_iter && !done; ++it) {
                // First pass: samples + (optional) current-patch mean.
                float curv[kMaxPatch][kMaxPatch];
                bool okc[kMaxPatch][kMaxPatch];
                float mean_acc = 0.0f;
                int n_cur = 0;
                for (int i = 0; i < pr; ++i) {
                    for (int j = 0; j < pc; ++j) {
                        float px = rx + static_cast<float>(j - pc / 2);
                        float py = ry + static_cast<float>(i - pr / 2);
                        float wx = c00 * px + c01 * py + cx;
                        float wy = c10 * px + c11 * py + cy;
                        float v = 0.0f;
                        bool ok = warp_sample(C, wx, wy, &v);
                        okc[i][j] = ok;
                        curv[i][j] = ok ? v : 0.0f;
                        n_cur += ok;
                        // Inner-of-patch numerator, whole-patch count
                        // (lssd_klt_fast.cpp:66-73).
                        if (i >= 1 && i <= pr - 2 && j >= 1
                            && j <= pc - 2)
                            mean_acc += curv[i][j];
                    }
                }
                float cur_mean = 1.0f;
                if (luminance)
                    cur_mean = mean_acc
                             / static_cast<float>(n_cur > 0 ? n_cur : 1);

                float hess[3][3] = {};
                float b3[3] = {};
                int num_valid = 0;
                for (int i = 0; i < pr; ++i) {
                    for (int j = 0; j < pc; ++j) {
                        if (!(okc[i][j] && S.ex_valid[i + 1][j + 1]))
                            continue;
                        float px = rx + static_cast<float>(j - pc / 2);
                        float py = ry + static_cast<float>(i - pr / 2);
                        // d(pos)/dtheta = R @ (-row, col).
                        float jt_x = c00 * (-py) + c01 * px;
                        float jt_y = c10 * (-py) + c11 * px;
                        float jtheta = S.dx[i][j] * jt_x
                                     + S.dy[i][j] * jt_y;
                        float res = curv[i][j] / cur_mean - inner[i][j];
                        hess[0][0] += jtheta * jtheta;
                        hess[1][0] += S.dx[i][j] * jtheta;
                        hess[1][1] += S.dx[i][j] * S.dx[i][j];
                        hess[2][0] += S.dy[i][j] * jtheta;
                        hess[2][1] += S.dy[i][j] * S.dx[i][j];
                        hess[2][2] += S.dy[i][j] * S.dy[i][j];
                        b3[0] -= jtheta * res;
                        b3[1] -= S.dx[i][j] * res;
                        b3[2] -= S.dy[i][j] * res;
                        ++num_valid;
                    }
                }
                if (num_valid == 0) break;
                hess[0][1] = hess[1][0];
                hess[0][2] = hess[2][0];
                hess[1][2] = hess[2][1];
                float v3[3];
                chol_solve<3>(hess, b3, v3);
                if (std::isnan(v3[0]) || std::isnan(v3[1])
                    || std::isnan(v3[2])) {
                    st = kNumericError;
                    break;
                }
                // rot @ [[1, -v0], [v0, 1]], then division by the first
                // column's norm (lssd_klt.cpp:113-117).
                float n00 = c00 + c01 * v3[0];
                float n01 = c01 - c00 * v3[0];
                float n10 = c10 + c11 * v3[0];
                float n11 = c11 - c10 * v3[0];
                float norm = std::sqrt(n00 * n00 + n10 * n10);
                c00 = n00 / norm;
                c01 = n01 / norm;
                c10 = n10 / norm;
                c11 = n11 / norm;
                cx += v3[1];
                cy += v3[2];
                float sq = v3[0] * v3[0] + v3[1] * v3[1] + v3[2] * v3[2];
                if (sq < last_sq) {
                    last_sq = sq;
                    large_cnt = 0;
                } else if (++large_cnt >= max_tolerance_large_step) {
                    break;
                }
                if (sq < max_converge_step) {
                    st = kTracked;
                    break;
                }
            }

            if (lvl > 0) {
                rx *= 2.0f;
                ry *= 2.0f;
                cx *= 2.0f;
                cy *= 2.0f;
            }
        }

        // Final full-resolution position R_cr @ ref_uv + t_cr.
        float fx = c00 * ref_uv[2 * f] + c01 * ref_uv[2 * f + 1] + cx;
        float fy = c10 * ref_uv[2 * f] + c11 * ref_uv[2 * f + 1] + cy;
        if (fx < 0.0f || fx > static_cast<float>(w0 - 1) || fy < 0.0f
            || fy > static_cast<float>(h0 - 1)) {
            st = kOutside;
        }
        cur_uv[2 * f] = fx;
        cur_uv[2 * f + 1] = fy;
        status[f] = st;
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------- Farneback
// Single-thread dense optical flow via Gaussian polynomial expansion —
// the measured-CPU-baseline counterpart of trackers/dense.py (reference
// algorithm: dense_optical_flow.cpp:87-371). Faithful per-pixel loops,
// structurally independent implementation: flat row-major arrays, direct
// O(k^2) moment windows with replicate border, per-pixel damped 2x2 GN
// with step cap, 3x3 median, bilinear 2x upsample with magnitude x2.

static inline float fb_px(const float* img, int h, int w, int r, int c) {
    if (r < 0) r = 0;
    if (r > h - 1) r = h - 1;
    if (c < 0) c = 0;
    if (c > w - 1) c = w - 1;
    return img[r * w + c];
}

// 6 Gaussian-weighted moment maps (S0, Sr, Sc, Src, Srr, Scc), [6*h*w].
static void fb_moments(const float* img, int h, int w, int half,
                       float* out) {
    const int k = 2 * half + 1;
    std::vector<float> g(k);
    double gs = 0.0;
    for (int i = 0; i < k; ++i) {
        double d = i - half;
        g[i] = static_cast<float>(std::exp(-0.5 * d * d));
        gs += g[i];
    }
    // Normalized 2D kernel w(dr, dc) = g(dr) g(dc) / sum.
    const double norm = gs * gs;
    for (int r = 0; r < h; ++r) {
        for (int c = 0; c < w; ++c) {
            double s0 = 0, sr = 0, sc = 0, src = 0, srr = 0, scc = 0;
            for (int dr = -half; dr <= half; ++dr) {
                for (int dc = -half; dc <= half; ++dc) {
                    double wgt = (double)g[dr + half] * g[dc + half] / norm;
                    double v = wgt * fb_px(img, h, w, r + dr, c + dc);
                    s0 += v;
                    sr += v * dr;
                    sc += v * dc;
                    src += v * dr * dc;
                    srr += v * dr * dr;
                    scc += v * dc * dc;
                }
            }
            const int n = h * w;
            out[0 * n + r * w + c] = (float)s0;
            out[1 * n + r * w + c] = (float)sr;
            out[2 * n + r * w + c] = (float)sc;
            out[3 * n + r * w + c] = (float)src;
            out[4 * n + r * w + c] = (float)srr;
            out[5 * n + r * w + c] = (float)scc;
        }
    }
}

// Kernel moments k2/k4/k22 of the normalized 2D Gaussian window.
static void fb_kernel_moments(int half, float* k2, float* k4, float* k22) {
    const int k = 2 * half + 1;
    std::vector<double> g(k);
    double gs = 0.0;
    for (int i = 0; i < k; ++i) {
        double d = i - half;
        g[i] = std::exp(-0.5 * d * d);
        gs += g[i];
    }
    double m2 = 0, m4 = 0, m22 = 0;
    for (int i = 0; i < k; ++i) {
        for (int j = 0; j < k; ++j) {
            double wgt = g[i] * g[j] / (gs * gs);
            double dr = i - half, dc = j - half;
            m2 += wgt * dr * dr;
            m4 += wgt * dr * dr * dr * dr;
            m22 += wgt * dr * dr * dc * dc;
        }
    }
    *k2 = (float)m2;
    *k4 = (float)m4;
    *k22 = (float)m22;
}

static inline void fb_poly(const float* m6, int n, int idx, float k2,
                           float k4, float k22, float* a, float* bq,
                           float* c, float* br, float* bc) {
    const float s0 = m6[0 * n + idx], sr = m6[1 * n + idx];
    const float sc = m6[2 * n + idx], src = m6[3 * n + idx];
    const float srr = m6[4 * n + idx], scc = m6[5 * n + idx];
    const float dd = k4 - k2 * k2;
    const float ee = k22 - k2 * k2;
    const float t1 = (srr + scc - 2.0f * k2 * s0) / (dd + ee + 1e-6f);
    const float t2 = (srr - scc) / (dd - ee + 1e-6f);
    *a = 0.5f * (t1 + t2);
    *bq = 0.5f * (t1 - t2);
    *c = src / (k22 + 1e-6f);
    *br = sr / (k2 + 1e-6f);
    *bc = sc / (k2 + 1e-6f);
}

// Bilinear sample of one moment map at clamped float position.
static inline float fb_interp(const float* map, int h, int w, float r,
                              float c) {
    if (r < 0.0f) r = 0.0f;
    if (r > h - 1.0f) r = (float)(h - 1);
    if (c < 0.0f) c = 0.0f;
    if (c > w - 1.0f) c = (float)(w - 1);
    int r0 = (int)std::floor(r);
    int c0 = (int)std::floor(c);
    if (r0 > h - 2) r0 = h - 2;
    if (c0 > w - 2) c0 = w - 2;
    const float fr = r - r0, fc = c - c0;
    const float tl = map[r0 * w + c0], tr = map[r0 * w + c0 + 1];
    const float bl = map[(r0 + 1) * w + c0], brv = map[(r0 + 1) * w + c0 + 1];
    return (1 - fr) * (1 - fc) * tl + (1 - fr) * fc * tr
           + fr * (1 - fc) * bl + fr * fc * brv;
}

static void fb_median3x3(float* chan, int h, int w, float* tmp) {
    for (int r = 0; r < h; ++r) {
        for (int c = 0; c < w; ++c) {
            float v[9];
            int m = 0;
            for (int dr = -1; dr <= 1; ++dr)
                for (int dc = -1; dc <= 1; ++dc)
                    v[m++] = fb_px(chan, h, w, r + dr, c + dc);
            std::sort(v, v + 9);
            tmp[r * w + c] = v[4];
        }
    }
    std::memcpy(chan, tmp, sizeof(float) * h * w);
}

extern "C" int ftk_farneback_pyramid(
    const float** ref_imgs, const float** cur_imgs, const int* hs,
    const int* ws, int levels, int half, int max_iterations,
    float max_converge_step, float max_delta_flow_step,
    float* out_flow_row, float* out_flow_col) {
    if (levels < 1 || levels > 16 || half < 0 || half > 15) return 1;
    const int h0 = hs[0], w0 = ws[0];
    float k2, k4, k22;
    fb_kernel_moments(half, &k2, &k4, &k22);

    std::vector<float> flow_r, flow_c;
    for (int lvl = levels - 1; lvl >= 0; --lvl) {
        const int h = hs[lvl], w = ws[lvl], n = h * w;
        std::vector<float> m1(6 * n), m2(6 * n);
        fb_moments(ref_imgs[lvl], h, w, half, m1.data());
        fb_moments(cur_imgs[lvl], h, w, half, m2.data());

        std::vector<float> fr(n, 0.0f), fc(n, 0.0f);
        if (lvl < levels - 1) {
            // Bilinear 2x upsample of the coarser flow, magnitude x2
            // (dense_optical_flow.cpp:64-79).
            const int sh = hs[lvl + 1], sw = ws[lvl + 1];
            for (int r = 0; r < h; ++r) {
                for (int c = 0; c < w; ++c) {
                    fr[r * w + c] = 2.0f * fb_interp(flow_r.data(), sh, sw,
                                                     0.5f * r, 0.5f * c);
                    fc[r * w + c] = 2.0f * fb_interp(flow_c.data(), sh, sw,
                                                     0.5f * r, 0.5f * c);
                }
            }
        }

        for (int r = 0; r < h; ++r) {
            for (int c = 0; c < w; ++c) {
                const int idx = r * w + c;
                float a1, bq1, c1, br1, bc1;
                fb_poly(m1.data(), n, idx, k2, k4, k22, &a1, &bq1, &c1,
                        &br1, &bc1);
                float vr = fr[idx], vc = fc[idx];
                for (int it = 0; it < max_iterations; ++it) {
                    // Sample the 6 cur moments at the warped position,
                    // then its polynomial coefficients.
                    float m6s[6];
                    for (int q = 0; q < 6; ++q)
                        m6s[q] = fb_interp(m2.data() + q * n, h, w,
                                           r + vr, c + vc);
                    const float s0 = m6s[0], sr_ = m6s[1], sc_ = m6s[2];
                    const float src_ = m6s[3], srr_ = m6s[4],
                                scc_ = m6s[5];
                    const float dd = k4 - k2 * k2, ee = k22 - k2 * k2;
                    const float t1 =
                        (srr_ + scc_ - 2.0f * k2 * s0) / (dd + ee + 1e-6f);
                    const float t2 = (srr_ - scc_) / (dd - ee + 1e-6f);
                    const float a2 = 0.5f * (t1 + t2);
                    const float bq2 = 0.5f * (t1 - t2);
                    const float c2 = src_ / (k22 + 1e-6f);
                    const float br2 = sr_ / (k2 + 1e-6f);
                    const float bc2 = sc_ / (k2 + 1e-6f);
                    // M = A1 + A2, d = b1 - b2; H = M^T M + lambda I.
                    const float m00 = a1 + a2;
                    const float m01 = 0.5f * (c1 + c2);
                    const float m11 = bq1 + bq2;
                    const float d0 = br1 - br2, d1 = bc1 - bc2;
                    float h00 = m00 * m00 + m01 * m01;
                    const float h01 = m01 * (m00 + m11);
                    float h11 = m01 * m01 + m11 * m11;
                    const float lam = 0.1f * (h00 + h11) + 1.0f;
                    h00 += lam;
                    h11 += lam;
                    const float g0 = m00 * d0 + m01 * d1;
                    const float g1 = m01 * d0 + m11 * d1;
                    const float det = h00 * h11 - h01 * h01;
                    float dr = (h11 * g0 - h01 * g1) / det;
                    float dc = (h00 * g1 - h01 * g0) / det;
                    const float nrm = std::sqrt(dr * dr + dc * dc);
                    if (nrm > max_delta_flow_step) {
                        dr *= max_delta_flow_step / nrm;
                        dc *= max_delta_flow_step / nrm;
                    }
                    vr += dr;
                    vc += dc;
                    if (dr * dr + dc * dc < max_converge_step) break;
                }
                fr[idx] = vr;
                fc[idx] = vc;
            }
        }

        std::vector<float> tmp(n);
        fb_median3x3(fr.data(), h, w, tmp.data());
        fb_median3x3(fc.data(), h, w, tmp.data());
        flow_r.swap(fr);
        flow_c.swap(fc);
    }
    std::memcpy(out_flow_row, flow_r.data(), sizeof(float) * h0 * w0);
    std::memcpy(out_flow_col, flow_c.data(), sizeof(float) * h0 * w0);
    return 0;
}
