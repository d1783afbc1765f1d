#!/bin/bash
# Builds the reference-DoD oracle driver against the read-only reference
# mount. Output: tools/refgate/refdod
set -euo pipefail
cd "$(dirname "$0")"
REF=${REF:-/root/reference/src}
OUT=${OUT:-refdod}
# -include thread: Scene.cpp uses std::this_thread::sleep_for but relies on
# a transitive <thread> include that newer libstdc++ no longer provides; the
# reference mount is read-only so inject the header from the command line.
g++ -O3 -march=native -std=c++17 -funsafe-math-optimizations \
    -include thread \
    -I"$REF" -Istub \
    driver.cpp \
    "$REF"/math/Vec3.cpp "$REF"/math/Norm3.cpp "$REF"/math/Ray.cpp \
    "$REF"/math/Hit.cpp "$REF"/math/Camera.cpp \
    "$REF"/math/OrthoNormalBasis.cpp "$REF"/math/Samples.cpp \
    "$REF"/util/ArrayOutput.cpp "$REF"/util/SampledPixel.cpp \
    "$REF"/util/Progressifier.cpp "$REF"/util/RenderParams.cpp \
    "$REF"/dod/Scene.cpp "$REF"/dod/TriangleVertices.cpp \
    -o "$OUT" -lpthread
echo "built $(pwd)/$OUT"
