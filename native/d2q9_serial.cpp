// Native serial D2Q9 BGK engine: the framework's independent host-side
// oracle, and the true "native executable" analogue of the reference's
// serial golden standard (reference: main/LastChance.cpp:120-288 and
// main/LbmCpu.cpp:235-345 — same physics, independently implemented here
// on the SoA (9, ny, nx) layout with templated precision).
//
// Semantics contract (shared with lbm_tpu/ops/d2q9.py, the numerically
// authoritative engine): pull-streaming with periodic wraparound, obstacle
// bounce-back of the streamed speeds, BGK collision in the rearranged
// `c_sq = 1 - 1.5 u^2` / `(4.5 eu)(2/3 + eu)` grouping, the accelerated-row
// body force folded into the collided state, and per-step
// tot_u = sum over free cells of sqrt(u_x^2 + u_y^2). The expression
// grouping is kept identical so float32 runs land in the same rounding
// class as the JAX engines; tot_u accumulates in double (serial order).
//
// Exported via C ABI, bound in lbm_tpu/ops/d2q9_native.py (ctypes).
// Build: make -C native   (part of liblbmio.so)

#include <cmath>
#include <cstring>

namespace {

template <typename T>
void first_accelerate(T *f, const unsigned char *obs, long ny, long nx,
                      long accel_row, T w1, T w2) {
    // One-off guarded acceleration of the target row before the loop
    // (reference: main/LastChance.cpp:163-183). Plane k lives at
    // f + k*ny*nx.
    const long plane = ny * nx;
    T *row = f + accel_row * nx;
    const unsigned char *orow = obs + accel_row * nx;
    for (long x = 0; x < nx; x++) {
        const bool ok = !orow[x] && row[3 * plane + x] - w1 > (T)0 &&
                        row[6 * plane + x] - w2 > (T)0 &&
                        row[7 * plane + x] - w2 > (T)0;
        if (ok) {
            row[1 * plane + x] += w1;
            row[3 * plane + x] -= w1;
            row[5 * plane + x] += w2;
            row[6 * plane + x] -= w2;
            row[7 * plane + x] -= w2;
            row[8 * plane + x] += w2;
        }
    }
}

template <typename T>
double step(const T *__restrict in, T *__restrict out,
            const unsigned char *__restrict obs, long ny, long nx, T omega,
            T w1, T w2, long accel_row) {
    const long plane = ny * nx;
    const T one_minus_omega = (T)1 - omega;
    const T two_thirds = (T)(2.0 / 3.0);
    double tot = 0.0;
    for (long y = 0; y < ny; y++) {
        const long ym = (y == 0 ? ny - 1 : y - 1) * nx;  // pulled-from south
        const long yp = (y == ny - 1 ? 0 : y + 1) * nx;  // pulled-from north
        const long yr = y * nx;
        const bool accel = y == accel_row;
        for (long x = 0; x < nx; x++) {
            const long xm = x == 0 ? nx - 1 : x - 1;
            const long xp = x == nx - 1 ? 0 : x + 1;
            // pull-streaming: speed k at x comes from x - e_k
            const T s0 = in[0 * plane + yr + x];
            const T s1 = in[1 * plane + yr + xm];
            const T s2 = in[2 * plane + ym + x];
            const T s3 = in[3 * plane + yr + xp];
            const T s4 = in[4 * plane + yp + x];
            const T s5 = in[5 * plane + ym + xm];
            const T s6 = in[6 * plane + ym + xp];
            const T s7 = in[7 * plane + yp + xp];
            const T s8 = in[8 * plane + yp + xm];
            const long i = yr + x;
            if (obs[i]) {
                // bounce-back: each speed takes its opposite's streamed value
                out[0 * plane + i] = s0;
                out[1 * plane + i] = s3;
                out[2 * plane + i] = s4;
                out[3 * plane + i] = s1;
                out[4 * plane + i] = s2;
                out[5 * plane + i] = s7;
                out[6 * plane + i] = s8;
                out[7 * plane + i] = s5;
                out[8 * plane + i] = s6;
                continue;
            }
            const T rho = s0 + s1 + s2 + s3 + s4 + s5 + s6 + s7 + s8;
            const T u_x = (s1 + s5 + s8 - (s3 + s6 + s7)) / rho;
            const T u_y = (s2 + s5 + s6 - (s4 + s7 + s8)) / rho;
            const T u_sq = u_x * u_x + u_y * u_y;
            const T c_sq = (T)1 - u_sq * (T)1.5;
            const T ld0 = (T)(4.0 / 9.0) * rho * omega;
            const T ld1 = rho / (T)9 * omega;
            const T ld2 = rho / (T)36 * omega;
            const T u_s = u_x + u_y;
            const T u_d = -u_x + u_y;
            T o1 = s1 * one_minus_omega +
                   ld1 * (((T)4.5 * u_x) * (two_thirds + u_x) + c_sq);
            T o3 = s3 * one_minus_omega +
                   ld1 * (((T)-4.5 * u_x) * (two_thirds - u_x) + c_sq);
            T o5 = s5 * one_minus_omega +
                   ld2 * (((T)4.5 * u_s) * (two_thirds + u_s) + c_sq);
            T o6 = s6 * one_minus_omega +
                   ld2 * (((T)4.5 * u_d) * (two_thirds + u_d) + c_sq);
            T o7 = s7 * one_minus_omega +
                   ld2 * (((T)-4.5 * u_s) * (two_thirds - u_s) + c_sq);
            T o8 = s8 * one_minus_omega +
                   ld2 * (((T)-4.5 * u_d) * (two_thirds - u_d) + c_sq);
            if (accel) {
                o1 += w1;
                o3 -= w1;
                o5 += w2;
                o6 -= w2;
                o7 -= w2;
                o8 += w2;
            }
            out[0 * plane + i] = s0 * one_minus_omega + ld0 * c_sq;
            out[1 * plane + i] = o1;
            out[2 * plane + i] =
                s2 * one_minus_omega +
                ld1 * (((T)4.5 * u_y) * (two_thirds + u_y) + c_sq);
            out[3 * plane + i] = o3;
            out[4 * plane + i] =
                s4 * one_minus_omega +
                ld1 * (((T)-4.5 * u_y) * (two_thirds - u_y) + c_sq);
            out[5 * plane + i] = o5;
            out[6 * plane + i] = o6;
            out[7 * plane + i] = o7;
            out[8 * plane + i] = o8;
            tot += std::sqrt((double)u_sq);
        }
    }
    return tot;
}

template <typename T>
void run(T *f, T *scratch, const unsigned char *obs, long ny, long nx,
         long steps, T omega, T w1, T w2, long accel_row, double *tot_u) {
    T *cur = f, *nxt = scratch;
    for (long i = 0; i < steps; i++) {
        tot_u[i] = step<T>(cur, nxt, obs, ny, nx, omega, w1, w2, accel_row);
        T *tmp = cur;
        cur = nxt;
        nxt = tmp;
    }
    if (cur != f)
        std::memcpy(f, cur, sizeof(T) * 9 * ny * nx);
}

}  // namespace

extern "C" {

void d2q9_first_accelerate_f64(double *f, const unsigned char *obs, long ny,
                               long nx, long accel_row, double w1, double w2) {
    first_accelerate<double>(f, obs, ny, nx, accel_row, w1, w2);
}

void d2q9_first_accelerate_f32(float *f, const unsigned char *obs, long ny,
                               long nx, long accel_row, float w1, float w2) {
    first_accelerate<float>(f, obs, ny, nx, accel_row, w1, w2);
}

void d2q9_run_f64(double *f, double *scratch, const unsigned char *obs,
                  long ny, long nx, long steps, double omega, double w1,
                  double w2, long accel_row, double *tot_u) {
    run<double>(f, scratch, obs, ny, nx, steps, omega, w1, w2, accel_row,
                tot_u);
}

void d2q9_run_f32(float *f, float *scratch, const unsigned char *obs, long ny,
                  long nx, long steps, float omega, float w1, float w2,
                  long accel_row, double *tot_u) {
    run<float>(f, scratch, obs, ny, nx, steps, omega, w1, w2, accel_row,
               tot_u);
}

}  // extern "C"
