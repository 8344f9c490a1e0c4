// Minimal glm shim for compiling the reference renderer on Linux.
// The reference uses only glm::vec3 (pathTracing.cpp:301, component +=) and
// glm::clamp (MTPC.cpp:26-28, not compiled here).  NOT a copy of glm.
// Components are float, matching real GLM's vec3 — the reference accumulates
// per-pixel radiance in float even though its geometry is double
// (SURVEY.md quirk #14), and the goldens should reproduce that rounding.
#pragma once

namespace glm {

struct vec3 {
    float x, y, z;
    vec3() : x(0), y(0), z(0) {}
    vec3(double a, double b, double c)
        : x(static_cast<float>(a)),
          y(static_cast<float>(b)),
          z(static_cast<float>(c)) {}
};

template <typename T>
T clamp(T v, T lo, T hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace glm
