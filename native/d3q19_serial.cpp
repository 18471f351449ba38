// Native serial D3Q19 BGK engine: the 3-D counterpart of d2q9_serial.cpp.
//
// The reference is 2-D only; this oracle independently implements the same
// 19-velocity lattice semantics as lbm_tpu/ops/d3q19.py (pull streaming
// with periodic wraparound, bounce-back rebound, BGK collision in the
// round-4 paired-opposite grouping — opposite speeds share eu, the
// quadratic term and w*omega*rho, lockstep with collide_fields
// GROUPING=='paired' — accelerated-plane body force on x-moving speeds,
// per-step Sum|u| over free cells) so the JAX and Pallas 3-D engines have
// a fast no-JAX host cross-check. Speed tables and accumulation order
// mirror d3q19.py exactly (E, W, OPPOSITE; u-moment left-fold in
// ascending k) so f32 runs land in the same rounding class.
//
// Exported via C ABI, bound in lbm_tpu/ops/d3q19_native.py (ctypes).
// Build: make -C native   (part of liblbmio.so)

#include <cmath>
#include <cstring>

namespace {

// E[k] = (dz, dy, dx), same order as lbm_tpu/ops/d3q19.py
const int EZ[19] = {0, 0, 0, 0, 0, 1, -1, 0, 0, 0, 0, 1, 1, -1, -1, 1, 1, -1, -1};
const int EY[19] = {0, 0, 0, 1, -1, 0, 0, 1, 1, -1, -1, 0, 0, 0, 0, 1, -1, 1, -1};
const int EX[19] = {0, 1, -1, 0, 0, 0, 0, 1, -1, 1, -1, 1, -1, 1, -1, 0, 0, 0, 0};
const int OPP[19] = {0, 2, 1, 4, 3, 6, 5, 10, 9, 8, 7, 14, 13, 12, 11, 18, 17, 16, 15};

template <typename T>
double step(const T *__restrict in, T *__restrict out,
            const unsigned char *__restrict obs, long nz, long ny, long nx,
            T omega, T density, T accel, long accel_plane) {
    const long plane = nz * ny * nx;
    const T one_minus_omega = (T)1 - omega;
    const T w0 = (T)(1.0 / 3.0), w1 = (T)(1.0 / 18.0), w2 = (T)(1.0 / 36.0);
    const T wt[19] = {w0, w1, w1, w1, w1, w1, w1, w2, w2, w2, w2,
                      w2, w2, w2, w2, w2, w2, w2, w2};
    double tot = 0.0;
    T s[19];
    for (long z = 0; z < nz; z++) {
        const long zm = z == 0 ? nz - 1 : z - 1;
        const long zp = z == nz - 1 ? 0 : z + 1;
        const bool on_accel = z == accel_plane;
        for (long y = 0; y < ny; y++) {
            const long ym = y == 0 ? ny - 1 : y - 1;
            const long yp = y == ny - 1 ? 0 : y + 1;
            for (long x = 0; x < nx; x++) {
                const long xm = x == 0 ? nx - 1 : x - 1;
                const long xp = x == nx - 1 ? 0 : x + 1;
                // pull: speed k at (z,y,x) streams from (z,y,x) - e_k
                for (int k = 0; k < 19; k++) {
                    const long sz = EZ[k] > 0 ? zm : (EZ[k] < 0 ? zp : z);
                    const long sy = EY[k] > 0 ? ym : (EY[k] < 0 ? yp : y);
                    const long sx = EX[k] > 0 ? xm : (EX[k] < 0 ? xp : x);
                    s[k] = in[k * plane + (sz * ny + sy) * nx + sx];
                }
                const long i = (z * ny + y) * nx + x;
                if (obs[i]) {
                    for (int k = 0; k < 19; k++)
                        out[k * plane + i] = s[OPP[k]];
                    continue;
                }
                T rho = s[0];
                for (int k = 1; k < 19; k++) rho += s[k];
                // left-fold in ascending k, like d3q19.collide_fields
                T mx = 0, my = 0, mz = 0;
                for (int k = 0; k < 19; k++) {
                    if (EX[k]) mx += (T)EX[k] * s[k];
                    if (EY[k]) my += (T)EY[k] * s[k];
                    if (EZ[k]) mz += (T)EZ[k] * s[k];
                }
                const T u_x = mx / rho, u_y = my / rho, u_z = mz / rho;
                const T u_sq = u_x * u_x + u_y * u_y + u_z * u_z;
                const T c_sq = (T)1 - u_sq * (T)1.5;
                // paired-opposite grouping, in lockstep with
                // d3q19.collide_fields (GROUPING == 'paired'): opposite
                // speeds share eu, the quadratic term and w*omega*rho
                const T wro_0 = ((T)w0 * omega) * rho;
                const T wro_1 = ((T)w1 * omega) * rho;
                const T wro_2 = ((T)w2 * omega) * rho;
                out[0 * plane + i] = s[0] * one_minus_omega + wro_0 * c_sq;
                for (int k = 1; k < 19; k++) {
                    const int kb = OPP[k];
                    if (kb < k) continue;
                    T eu = 0;
                    if (EX[k]) eu += (T)EX[k] * u_x;
                    if (EY[k]) eu += (T)EY[k] * u_y;
                    if (EZ[k]) eu += (T)EZ[k] * u_z;
                    const T quad = ((T)4.5 * eu) * eu + c_sq;
                    const T lin = (T)3 * eu;
                    const T w = (k <= 6) ? wro_1 : wro_2;
                    T ok = s[k] * one_minus_omega + w * (quad + lin);
                    T okb = s[kb] * one_minus_omega + w * (quad - lin);
                    if (on_accel && EX[k]) {
                        const T t = (T)EX[k] * (density * accel * wt[k]);
                        ok += t;
                        okb -= t;
                    }
                    out[k * plane + i] = ok;
                    out[kb * plane + i] = okb;
                }
                tot += std::sqrt((double)u_sq);
            }
        }
    }
    return tot;
}

template <typename T>
void run(T *f, T *scratch, const unsigned char *obs, long nz, long ny,
         long nx, long steps, T omega, T density, T accel, long accel_plane,
         double *tot_u) {
    T *cur = f, *nxt = scratch;
    for (long i = 0; i < steps; i++) {
        tot_u[i] = step<T>(cur, nxt, obs, nz, ny, nx, omega, density, accel,
                           accel_plane);
        T *tmp = cur;
        cur = nxt;
        nxt = tmp;
    }
    if (cur != f)
        std::memcpy(f, cur, sizeof(T) * 19 * nz * ny * nx);
}

}  // namespace

extern "C" {

void d3q19_run_f64(double *f, double *scratch, const unsigned char *obs,
                   long nz, long ny, long nx, long steps, double omega,
                   double density, double accel, long accel_plane,
                   double *tot_u) {
    run<double>(f, scratch, obs, nz, ny, nx, steps, omega, density, accel,
                accel_plane, tot_u);
}

void d3q19_run_f32(float *f, float *scratch, const unsigned char *obs,
                   long nz, long ny, long nx, long steps, float omega,
                   float density, float accel, long accel_plane,
                   double *tot_u) {
    run<float>(f, scratch, obs, nz, ny, nx, steps, omega, density, accel,
               accel_plane, tot_u);
}

}  // extern "C"
