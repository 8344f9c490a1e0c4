// First-hit probe: prints the primary-hit material, t, and hit point for a
// pixel grid, replicating generateImg's ITERATIVE pos accumulation
// (pathTracing.cpp:296-309, pos += screen_pdx per column — the FP drift is
// semantically significant: an exact multiply makes d.x == 0 at the center
// column, where quirk #10 turns every hit into NaN).
// Usage: hitprobe <scene_dir/> <name> <stride>
#include "pathTracing.h"
#include "sceneManagement.h"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <string>

int main(int argc, char** argv) {
    std::string path = argv[1], name = argv[2];
    int stride = std::atoi(argv[3]);

    scene_data scene;
    scene.read_scene(path + name);
    std::sort(scene.f.begin(), scene.f.end(), compare);
    BVH bvh(scene);

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
        Vertex pos = start_point - (screen_pdy * i);
        for (int j = 0; j < scene.camera.width; j++) {
            if (j % stride == 0) {
                Ray ray;
                ray.start = scene.camera.eye;
                ray.direction = pos - scene.camera.eye;
                ray.direction.normalize();
                intersection ret;
                bool hit = ray_intersect(ray, scene, bvh, ret);
                if (hit)
                    std::printf("HIT %d %d %s %.9g %.6g %.6g %.6g\n", i, j,
                                ret.f.material.c_str(), ret.t,
                                ret.p.x, ret.p.y, ret.p.z);
                else
                    std::printf("HIT %d %d - nan 0 0 0\n", i, j);
            }
            pos = pos + screen_pdx;
        }
    }
    return 0;
}
