// Native I/O for lbm_tpu: fast exact-format .dat writers and readers.
//
// The runtime-side native half of the framework (the reference's host code is
// all C++; here the compute graph is XLA, and the performance-critical host
// I/O lives in this library). Formats are byte-identical to the Python
// fallbacks in lbm_tpu/core/io.py; they match the reference's writers
// (reference: main/include/LatticeBoltzmannUtils.hpp:208-346,
// main/LastChance.cpp:554-635) except for the final_state obstacle column,
// where the reference writes the transposed obstacles[ii*nx + jj] — a
// reference bug documented and deliberately fixed in core/io.py, so for
// non-symmetric masks that one column differs from reference output.
//
// Build: make -C native      (produces liblbmio.so, loaded via ctypes)

#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Writes final_state.dat: "x y u_x u_y u pressure obstacle" per cell,
// row-major over (ny, nx). Returns 0 on success, -1 on I/O error.
int lbmio_write_final_state(const char *path,
                            const double *u_x, const double *u_y,
                            const double *u, const double *pressure,
                            const unsigned char *obstacle,
                            long ny, long nx) {
    FILE *fp = fopen(path, "w");
    if (!fp) return -1;
    // ~110 bytes/line; buffer a megabyte of stdio. Heap-allocated per call so
    // concurrent writers (e.g. Python threads) never share a buffer; stdio
    // default buffering is the fallback if allocation fails.
    const size_t bufsize = 1 << 20;
    char *buf = (char *)malloc(bufsize);
    if (buf) setvbuf(fp, buf, _IOFBF, bufsize);
    for (long jj = 0; jj < ny; jj++) {
        const long row = jj * nx;
        for (long ii = 0; ii < nx; ii++) {
            const long idx = row + ii;
            if (fprintf(fp, "%ld %ld %.12E %.12E %.12E %.12E %d\n",
                        ii, jj, u_x[idx], u_y[idx], u[idx], pressure[idx],
                        (int)obstacle[idx]) < 0) {
                fclose(fp);
                free(buf);
                return -1;
            }
        }
    }
    const int rc = fclose(fp) == 0 ? 0 : -1;
    free(buf);
    return rc;
}

// Writes av_vels.dat: "<step>:\t<%.12E>" per line. 0 on success.
int lbmio_write_av_vels(const char *path, const double *vals, long n) {
    FILE *fp = fopen(path, "w");
    if (!fp) return -1;
    for (long i = 0; i < n; i++) {
        if (fprintf(fp, "%ld:\t%.12E\n", i, vals[i]) < 0) {
            fclose(fp);
            return -1;
        }
    }
    return fclose(fp) == 0 ? 0 : -1;
}

// Reads an obstacle file of "x y 1" lines into mask[ny*nx] (row-major).
// Exactly three whitespace-separated fields per line (matching the strict
// Python loader); blank lines allowed. Returns the number of entries read,
// or -1 on parse/range error.
long lbmio_read_obstacles(const char *path, unsigned char *mask,
                          long ny, long nx) {
    FILE *fp = fopen(path, "r");
    if (!fp) return -1;
    char line[256];
    long count = 0;
    while (fgets(line, sizeof(line), fp)) {
        long x, y, blocked;
        char extra[2];
        int got = sscanf(line, " %ld %ld %ld %1s", &x, &y, &blocked, extra);
        if (got == EOF || got == 0) continue;  // blank line
        if (got != 3 || x < 0 || x >= nx || y < 0 || y >= ny || blocked != 1) {
            fclose(fp);
            return -1;
        }
        mask[y * nx + x] = 1;
        count++;
    }
    fclose(fp);
    return count;
}

}  // extern "C"
