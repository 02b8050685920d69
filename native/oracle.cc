// Serial fp64 oracle for the N-body scenario problems.
//
// Role: the executable specification (what samples/nbody.cc is for the
// reference, extended with a Problem-3 solver, which the reference's serial
// sample leaves as TODO at samples/nbody.cc:140-143). Used to validate the
// JAX engine and to regenerate golden outputs. Semantics follow the serial
// spec exactly: j-ascending force accumulation (samples/nbody.cc:57-73),
// pow(d2, 1.5) by default, semi-implicit Euler, strict `<` comparisons,
// step-0 inclusion, expanding-missile-sphere arrival (hw5.cu:270-274),
// destruction effective from the arrival step with cost 1e5+1e3*(s+1)*dt
// (hw5.cu:299-308).
//
// Build: make -C native    Run: ./native/oracle <in> <out> [n_steps] [mode]
//   mode: pow (default) | dsqrt | sqrt3  — fp64 evaluation of (d^2)^1.5

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

struct Bodies {
    int n = 0;
    int planet = 0;
    int asteroid = 0;
    std::vector<double> qx, qy, qz, vx, vy, vz, mass;
    std::vector<bool> is_device;
    std::vector<int> devices;  // body indices, ascending file order
};

enum class Dist3Mode { kPow, kDSqrt, kSqrt3 };

struct Params {
    int n_steps = 200000;
    double dt = 60.0;
    double eps = 1e-3;
    double G = 6.674e-11;
    double planet_radius = 1e7;
    double missile_speed = 1e6;
    Dist3Mode mode = Dist3Mode::kPow;
};

Bodies load(const char* path) {
    FILE* f = std::fopen(path, "r");
    if (!f) {
        std::fprintf(stderr, "cannot open %s\n", path);
        std::exit(1);
    }
    Bodies b;
    if (std::fscanf(f, "%d %d %d", &b.n, &b.planet, &b.asteroid) != 3) {
        std::fprintf(stderr, "bad header in %s\n", path);
        std::exit(1);
    }
    b.qx.resize(b.n); b.qy.resize(b.n); b.qz.resize(b.n);
    b.vx.resize(b.n); b.vy.resize(b.n); b.vz.resize(b.n);
    b.mass.resize(b.n); b.is_device.assign(b.n, false);
    char kind[64];
    for (int i = 0; i < b.n; ++i) {
        if (std::fscanf(f, "%lf %lf %lf %lf %lf %lf %lf %63s",
                        &b.qx[i], &b.qy[i], &b.qz[i], &b.vx[i], &b.vy[i],
                        &b.vz[i], &b.mass[i], kind) != 8) {
            std::fprintf(stderr, "bad body line %d in %s\n", i, path);
            std::exit(1);
        }
        if (std::strcmp(kind, "device") == 0) {
            b.is_device[i] = true;
            b.devices.push_back(i);
        }
    }
    std::fclose(f);
    return b;
}

inline double dist3_of(double d2, Dist3Mode mode) {
    switch (mode) {
        case Dist3Mode::kPow:   return std::pow(d2, 1.5);
        case Dist3Mode::kDSqrt: return d2 * std::sqrt(d2);
        case Dist3Mode::kSqrt3: return std::sqrt(d2 * d2 * d2);
    }
    return 0.0;
}

// One integration step to global step index `step` (forces evaluated at
// t = step*dt with the previous positions; samples/nbody.cc:51-88).
// `dead` (if >= 0) is a destroyed device whose mass is pinned to zero.
void advance(const Params& p, const Bodies& base, bool devices_on, int dead,
             int step, std::vector<double>& qx, std::vector<double>& qy,
             std::vector<double>& qz, std::vector<double>& vx,
             std::vector<double>& vy, std::vector<double>& vz) {
    const int n = base.n;
    const double t = step * p.dt;
    const double fst = std::fabs(std::sin(t / 6000.0));
    std::vector<double> m(n);
    for (int j = 0; j < n; ++j) {
        double mj = base.mass[j];
        if (base.is_device[j]) {
            if (!devices_on || j == dead) mj = 0.0;
            mj = mj + 0.5 * mj * fst;  // samples/nbody.cc:14-16
        }
        m[j] = mj;
    }
    std::vector<double> ax(n, 0.0), ay(n, 0.0), az(n, 0.0);
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < n; ++j) {
            if (j == i) continue;
            const double dx = qx[j] - qx[i];
            const double dy = qy[j] - qy[i];
            const double dz = qz[j] - qz[i];
            const double d2 = dx * dx + dy * dy + dz * dz + p.eps * p.eps;
            const double d3 = dist3_of(d2, p.mode);
            ax[i] += p.G * m[j] * dx / d3;
            ay[i] += p.G * m[j] * dy / d3;
            az[i] += p.G * m[j] * dz / d3;
        }
    }
    for (int i = 0; i < n; ++i) {
        vx[i] += ax[i] * p.dt;
        vy[i] += ay[i] * p.dt;
        vz[i] += az[i] * p.dt;
    }
    for (int i = 0; i < n; ++i) {
        qx[i] += vx[i] * p.dt;
        qy[i] += vy[i] * p.dt;
        qz[i] += vz[i] * p.dt;
    }
}

inline double sq_dist(const std::vector<double>& x,
                      const std::vector<double>& y,
                      const std::vector<double>& z, int a, int b) {
    const double dx = x[a] - x[b];
    const double dy = y[a] - y[b];
    const double dz = z[a] - z[b];
    return dx * dx + dy * dy + dz * dz;
}

struct Snapshot {
    int step = -2;  // arrival step, -2 if the missile never reaches it
    std::vector<double> qx, qy, qz, vx, vy, vz;
};

}  // namespace

int main(int argc, char** argv) {
    if (argc < 3) {
        std::fprintf(stderr,
                     "usage: %s <in> <out> [n_steps] [pow|dsqrt|sqrt3]\n",
                     argv[0]);
        return 2;
    }
    Params p;
    if (argc > 3) p.n_steps = std::atoi(argv[3]);
    if (argc > 4) {
        if (std::strcmp(argv[4], "dsqrt") == 0) p.mode = Dist3Mode::kDSqrt;
        else if (std::strcmp(argv[4], "sqrt3") == 0) p.mode = Dist3Mode::kSqrt3;
        else if (std::strcmp(argv[4], "pow") != 0) {
            std::fprintf(stderr, "unknown mode %s\n", argv[4]);
            return 2;
        }
    }

    const Bodies base = load(argv[1]);
    const double r2 = p.planet_radius * p.planet_radius;
    const int D = static_cast<int>(base.devices.size());

    // ---- Problem 1: devices off, min planet-asteroid distance ----
    double min_d2 = std::numeric_limits<double>::infinity();
    {
        std::vector<double> qx = base.qx, qy = base.qy, qz = base.qz;
        std::vector<double> vx = base.vx, vy = base.vy, vz = base.vz;
        for (int step = 0; step <= p.n_steps; ++step) {
            if (step > 0)
                advance(p, base, /*devices_on=*/false, -1, step,
                        qx, qy, qz, vx, vy, vz);
            const double d2 = sq_dist(qx, qy, qz, base.planet, base.asteroid);
            if (d2 < min_d2) min_d2 = d2;
        }
    }
    const double min_dist = std::sqrt(min_d2);

    // ---- Problem 2 (+ Problem-3 preprocessing: arrivals & snapshots) ----
    int hit_step = -2;
    std::vector<Snapshot> snaps(D);
    {
        std::vector<double> qx = base.qx, qy = base.qy, qz = base.qz;
        std::vector<double> vx = base.vx, vy = base.vy, vz = base.vz;
        const double sdt = p.missile_speed * p.dt;
        for (int step = 0; step <= p.n_steps; ++step) {
            if (step > 0)
                advance(p, base, /*devices_on=*/true, -1, step,
                        qx, qy, qz, vx, vy, vz);
            for (int k = 0; k < D; ++k) {
                if (snaps[k].step != -2) continue;
                const double md = sdt * step;
                if (sq_dist(qx, qy, qz, base.planet, base.devices[k]) <
                    md * md) {
                    snaps[k].step = step;
                    snaps[k].qx = qx; snaps[k].qy = qy; snaps[k].qz = qz;
                    snaps[k].vx = vx; snaps[k].vy = vy; snaps[k].vz = vz;
                }
            }
            if (hit_step == -2 &&
                sq_dist(qx, qy, qz, base.planet, base.asteroid) < r2) {
                hit_step = step;
                // Arrivals after the hit cannot save the planet; stop like
                // the reference's sync-batched break (hw5.cu:398-402).
                break;
            }
        }
    }

    // ---- Problem 3: cheapest device whose destruction saves the planet ----
    int winner = -1;
    double winner_cost = 0.0;
    if (hit_step != -2) {
        double best_cost = std::numeric_limits<double>::infinity();
        for (int k = 0; k < D; ++k) {
            const int arr = snaps[k].step;
            if (arr == -2 || arr > hit_step) continue;
            std::vector<double> qx = snaps[k].qx, qy = snaps[k].qy,
                                qz = snaps[k].qz, vx = snaps[k].vx,
                                vy = snaps[k].vy, vz = snaps[k].vz;
            bool hit = sq_dist(qx, qy, qz, base.planet, base.asteroid) < r2;
            for (int step = arr + 1; !hit && step <= p.n_steps; ++step) {
                advance(p, base, /*devices_on=*/true,
                        /*dead=*/base.devices[k], step,
                        qx, qy, qz, vx, vy, vz);
                if (sq_dist(qx, qy, qz, base.planet, base.asteroid) < r2)
                    hit = true;
            }
            if (!hit) {
                const double cost = 1e5 + 1e3 * ((arr + 1) * p.dt);
                if (cost < best_cost) {  // ties: earlier k = lower body index
                    best_cost = cost;
                    winner = base.devices[k];
                    winner_cost = cost;
                }
            }
        }
    }

    FILE* out = std::fopen(argv[2], "w");
    if (!out) {
        std::fprintf(stderr, "cannot open %s for writing\n", argv[2]);
        return 1;
    }
    // 16 digits after the point, matching hw5.cu:136-137 / '%.16e'.
    std::fprintf(out, "%.16e\n%d\n%d %.16e\n", min_dist, hit_step, winner,
                 winner_cost);
    std::fclose(out);
    return 0;
}
