// Portable driver for the reference renderer (replaces MTPC/MTPC.cpp, whose
// imshow/main use MSVC-only _itoa/fopen_s and hardcoded paths).  Compiles the
// five reference translation units unmodified from /root/reference/MTPC and
// runs the same pipeline as render_scene (MTPC/MTPC.cpp:35-68):
// read_scene -> Morton sort -> BVH -> generateImg -> clamp*255 PNG (no gamma).
//
// Usage: refbin <scene_dir_with_trailing_slash> <scene_name> <spp> <out.png>
// Used only to produce golden anchor images (tests/golden/) from the actual
// reference code; not part of the framework.
#include "pathTracing.h"
#include "sceneManagement.h"
#include "svpng.inc"

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <ctime>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    if (argc != 5) {
        std::fprintf(stderr, "usage: %s <scene_dir/> <name> <spp> <out.png>\n", argv[0]);
        return 2;
    }
    std::string path = argv[1];
    std::string name = argv[2];
    int spp = std::atoi(argv[3]);
    std::string out = argv[4];

    scene_data scene;
    clock_t start = clock();
    scene.read_scene(path + name);
    std::sort(scene.f.begin(), scene.f.end(), compare);
    BVH bvh(scene);
    std::printf("Phase 1(read scene + bvh build) time cost = %.1f ms\n",
                double(clock() - start) / CLOCKS_PER_SEC * 1000);

    image img(scene.camera.width, scene.camera.height);
    start = clock();
    generateImg(scene, bvh, img, spp);
    std::printf("Phase 2(ray tracing) = %.1f ms\n",
                double(clock() - start) / CLOCKS_PER_SEC * 1000);

    // Same tone map as imshow (MTPC/MTPC.cpp:26-28): clamp(c*255), no gamma.
    int W = scene.camera.width, H = scene.camera.height;
    std::vector<unsigned char> buf((size_t)W * H * 3);
    double* S = img.img;
    for (size_t i = 0; i < buf.size(); ++i) {
        double v = (*S++) * 255.0;
        buf[i] = (unsigned char)(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
    FILE* fp = std::fopen(out.c_str(), "wb");
    if (!fp) {
        std::perror("fopen");
        return 1;
    }
    svpng(fp, W, H, buf.data(), 0);
    std::fclose(fp);
    std::printf("wrote %s\n", out.c_str());
    return 0;
}
