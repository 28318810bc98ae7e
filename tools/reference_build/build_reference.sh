#!/bin/bash
# Build the reference C++ path tracer HEADLESS (no GL/GLFW/GLEW/X11 needed).
#
# The reference's own CMake build requires OpenGL dev headers + GLFW/GLEW
# (CMakeLists.txt:19-135, CGL/CMakeLists.txt); this machine has none of
# them.  The -f (write_to_file) code path never creates a window or touches
# GL (main.cpp:184-197), so we compile only the renderer subset plus CGL
# math and satisfy the viewer/GL symbols with no-op stubs (stubs.cpp):
#   - GL/glu.h is absent             -> glu_stub.h declares the two glu fns
#   - viewer.cpp / osdtext.cpp need GLFW/freetype -> replaced by stubs
#   - visual_debugger.cpp needs ImGui -> replaced by stubs (it is compiled
#     out in the reference itself, visual_debugger.cpp:25)
#   - core GL calls referenced by draw code -> no-op definitions
#
# Usage: build_reference.sh [BUILD_DIR]   (default /tmp/lft_reference_build)
# Produces: $BUILD_DIR/pathtracer_headless
#
# Known reference quirks the harness must accommodate (discovered while
# bringing this up; see tests/test_reference_binary.py):
#   - running WITHOUT -x/-y segfaults: resolve_path("") passes realpath's
#     NULL return to std::string (CGL/src/path.cpp:16)
#   - rendering a scene whose sun is OFF-SCREEN — or which has NO
#     directional light at all (verified on CBspheres_lambertian) —
#     segfaults: raytrace_starburst indexes flare_origins[0]
#     unconditionally per pixel (pathtracer.cpp:918) while find_sun_pos
#     only fills it for on-screen suns (pathtracer.cpp:41)
#   - CameraApertureTexture::init reads 4 bytes from a 1-byte stack variable
#     (camera.h:60, Color(&curr_texel)) — benign garbage in the g,b,a
#     channels, only .r is used
set -e
REF=${2:-/root/reference}
OUT=${1:-/tmp/lft_reference_build}
HERE="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$OUT/GL"
cp "$HERE/glu_stub.h" "$OUT/GL/glu.h"
INC="-I$OUT -I$REF/src -I$REF/CGL/include -I$REF/CGL/include/CGL \
     -I$REF/CGL/deps/glew/include -I$REF/CGL/deps/glfw/include -I$REF/src/imgui"

cd "$OUT"
while read -r f; do
  o=$(echo "$f" | tr / _).o
  [ "$o" -nt "$REF/$f" ] 2>/dev/null || g++ -O2 -std=c++14 $INC -c "$REF/$f" -o "$o"
done < "$HERE/sources.txt"
for f in color complex matrix3x3 matrix4x4 quaternion vector2D vector3D vector4D tinyxml2 path base64; do
  [ CGL_$f.o -nt "$REF/CGL/src/$f.cpp" ] 2>/dev/null || \
    g++ -O2 -std=c++14 $INC -c "$REF/CGL/src/$f.cpp" -o CGL_$f.o
done
g++ -O2 -std=c++14 $INC -c "$HERE/stubs.cpp" -o stubs.o
g++ -O2 ./*.o -o pathtracer_headless -lpthread
echo "built $OUT/pathtracer_headless"
