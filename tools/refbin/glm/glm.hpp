// Minimal glm shim for compiling the reference renderer on Linux.
// The reference uses only glm::vec3 (pathTracing.cpp:301, component +=) and
// glm::clamp (MTPC.cpp:26-28, not compiled here).  NOT a copy of glm.
#pragma once

namespace glm {

struct vec3 {
    double x, y, z;
    vec3() : x(0), y(0), z(0) {}
    vec3(double a, double b, double c) : x(a), y(b), z(c) {}
};

template <typename T>
T clamp(T v, T lo, T hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace glm
