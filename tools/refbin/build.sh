#!/bin/bash
# Compile the reference renderer (unmodified sources from /root/reference/MTPC)
# into tools/refbin/refbin for golden-image generation.  Shims: glm/ (vec3 +
# clamp only), Eigen/ (empty; the include is dead code).  -include cstring and
# -include mutex supply headers MSVC pulls in transitively.
set -e
cd "$(dirname "$0")"
REF=/root/reference/MTPC
OPENCV_INC=$(pkg-config --cflags opencv4 2>/dev/null || echo -I/usr/include/opencv4)
OPENCV_LIB=$(pkg-config --libs opencv4 2>/dev/null || echo "-lopencv_core -lopencv_imgcodecs")
g++ -O2 -std=c++17 -fopenmp -w \
    -I. -I"$REF" $OPENCV_INC \
    -include cstring -include mutex \
    main.cpp \
    "$REF/sceneManagement.cpp" "$REF/morton code.cpp" "$REF/BVH.cpp" "$REF/pathTracing.cpp" \
    -I"$REF" \
    $OPENCV_LIB \
    -o refbin
echo built: $(pwd)/refbin
