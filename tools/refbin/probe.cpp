// Per-pixel expectation probe for the reference integrator: renders a sparse
// pixel grid at high SPP by calling the reference's ray_intersect/shade
// directly (replicating generateImg's camera setup, pathTracing.cpp:274-309)
// and prints per-pixel mean radiance.  Used to localize semantic differences
// between the reference and the framework's f64 oracle.
//
// Usage: probe <scene_dir/> <name> <spp> <stride>
// Output lines: PIX i j r g b
#include "pathTracing.h"
#include "sceneManagement.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <string>

int main(int argc, char** argv) {
    if (argc != 5) {
        std::fprintf(stderr, "usage: %s <scene_dir/> <name> <spp> <stride>\n", argv[0]);
        return 2;
    }
    std::string path = argv[1], name = argv[2];
    int spp = std::atoi(argv[3]), stride = std::atoi(argv[4]);

    scene_data scene;
    scene.read_scene(path + name);
    std::sort(scene.f.begin(), scene.f.end(), compare);
    BVH bvh(scene);

    // Camera setup, verbatim semantics of generateImg (pathTracing.cpp:276-297).
    scene.camera.up.normalize();
    Vertex dir = scene.camera.look_at - scene.camera.eye;
    double l = dir.norm();
    double dy = tan(scene.camera.fovy / 2 / 180 * pi) * l;
    double dx = dy / scene.camera.height * scene.camera.width;
    Vertex screen_center = scene.camera.look_at;
    double pdx = 2 * dx / scene.camera.width, pdy = 2 * dy / scene.camera.height;
    Vertex screen_x_dir = dir.cross(scene.camera.up);
    screen_x_dir.normalize();
    Vertex screen_pdy = scene.camera.up * pdy;
    Vertex screen_pdx = screen_x_dir * pdx;
    Vertex start_point = screen_center - (screen_x_dir * dx) + (scene.camera.up * dy);

    for (int i = 0; i < scene.camera.height; i += stride) {
        for (int j = 0; j < scene.camera.width; j += stride) {
            Vertex pos = start_point - (screen_pdy * i) + (screen_pdx * j);
            double acc[3] = {0, 0, 0};
            for (int k = 0; k < spp; k++) {
                Ray ray;
                ray.start = scene.camera.eye;
                ray.direction = pos - scene.camera.eye;
                ray.direction.normalize();
                intersection ret;
                if (ray_intersect(ray, scene, bvh, ret)) {
                    Vertex radiance = shade(ret, ray.direction.negative(), scene, bvh);
                    acc[0] += radiance.x / spp;
                    acc[1] += radiance.y / spp;
                    acc[2] += radiance.z / spp;
                }
            }
            std::printf("PIX %d %d %.6f %.6f %.6f\n", i, j, acc[0], acc[1], acc[2]);
        }
    }
    return 0;
}
