// C API for the serial fp64 scenario solver (see core.cc).
#ifndef NBODY_NATIVE_CORE_H_
#define NBODY_NATIVE_CORE_H_

#include <stdint.h>

extern "C" {

// dist3_mode: 0 = pow(d2,1.5) (golden-generator semantics), 1 = d2*sqrt(d2),
// 2 = sqrt(d2^3).
// q, v: row-major (n, 3); m: (n,); device_idx: (device_cnt,) body indices
// ascending. Outputs: Problem 1/2/3 answers in the reference's conventions
// (hit_step == -2 if never; device_id == -1 and cost == 0 if no savior).
// Returns 0 on success.
int nbody_solve(int n, int planet, int asteroid, const double* q,
                const double* v, const double* m, const int32_t* device_idx,
                int device_cnt, int n_steps, int dist3_mode,
                double* out_min_dist, int32_t* out_hit_step,
                int32_t* out_device_id, double* out_cost);

// Same solver with the physics constants passed through instead of the
// reference defaults (the runtime-config analog of hw5.cu:50-67's
// compile-time `namespace param`). phys: 8 doubles
//   [dt, eps, G, planet_radius, missile_speed,
//    missile_cost_base, missile_cost_per_t, device_mass_period]
// phys == nullptr uses the reference defaults (then byte-identical to
// nbody_solve). Returns 0 on success.
int nbody_solve_cfg(int n, int planet, int asteroid, const double* q,
                    const double* v, const double* m,
                    const int32_t* device_idx, int device_cnt, int n_steps,
                    int dist3_mode, const double* phys,
                    double* out_min_dist, int32_t* out_hit_step,
                    int32_t* out_device_id, double* out_cost);

}  // extern "C"

#endif  // NBODY_NATIVE_CORE_H_
