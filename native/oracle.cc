// CLI front-end for the serial fp64 oracle core (core.cc).
//
// usage: oracle <in> <out> [n_steps] [pow|dsqrt|sqrt3]
//
// Reads the testcase format (n planet asteroid header + 8-token body lines,
// hw5.cu:86-103) and writes the 3-line output format (hw5.cu:133-141).

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "core.h"

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr,
                     "usage: %s <in> <out> [n_steps] [pow|dsqrt|sqrt3]\n",
                     argv[0]);
        return 2;
    }
    int n_steps = 200000;
    int mode = 0;
    if (argc > 3) n_steps = std::atoi(argv[3]);
    if (argc > 4) {
        if (std::strcmp(argv[4], "pow") == 0) mode = 0;
        else if (std::strcmp(argv[4], "dsqrt") == 0) mode = 1;
        else if (std::strcmp(argv[4], "sqrt3") == 0) mode = 2;
        else {
            std::fprintf(stderr, "unknown mode %s\n", argv[4]);
            return 2;
        }
    }

    FILE* f = std::fopen(argv[1], "r");
    if (!f) {
        std::fprintf(stderr, "cannot open %s\n", argv[1]);
        return 1;
    }
    int n, planet, asteroid;
    if (std::fscanf(f, "%d %d %d", &n, &planet, &asteroid) != 3) {
        std::fprintf(stderr, "bad header\n");
        return 1;
    }
    std::vector<double> q(3 * n), v(3 * n), m(n);
    std::vector<int32_t> devices;
    char kind[64];
    for (int i = 0; i < n; ++i) {
        if (std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %63s", &q[3 * i],
                        &q[3 * i + 1], &q[3 * i + 2], &v[3 * i],
                        &v[3 * i + 1], &v[3 * i + 2], &m[i], kind) != 8) {
            std::fprintf(stderr, "bad body line %d\n", i);
            return 1;
        }
        if (std::strcmp(kind, "device") == 0) devices.push_back(i);
    }
    std::fclose(f);

    double min_dist, cost;
    int32_t hit_step, device_id;
    const int rc = nbody_solve(n, planet, asteroid, q.data(), v.data(),
                               m.data(), devices.data(),
                               static_cast<int>(devices.size()), n_steps,
                               mode, &min_dist, &hit_step, &device_id, &cost);
    if (rc != 0) {
        std::fprintf(stderr, "nbody_solve failed: %d\n", rc);
        return 1;
    }

    FILE* out = std::fopen(argv[2], "w");
    if (!out) {
        std::fprintf(stderr, "cannot open %s for writing\n", argv[2]);
        return 1;
    }
    std::fprintf(out, "%.16e\n%d\n%d %.16e\n", min_dist, hit_step, device_id,
                 cost);
    std::fclose(out);
    return 0;
}
