#!/usr/bin/env bash
# Build the UNMODIFIED reference binaries (src/sfm.cpp, src/calibration.cpp,
# src/test_ceres_se3.cpp) headless against the vendored thirdparty tree +
# the Pangolin API stub (no GL on this host).  Produces the real reference
# baseline demanded by VERDICT.md item 1.
set -ex
cd "$(dirname "$0")"

REF=/root/reference
INC=(
  -Ioverlay_include   # common_types.h with 2 documented compile fixes (see logs/common_types_overlay.diff)
  -I"$REF/include"
  -Ipangolin_stub
  -I"$REF/thirdparty/eigen"
  -I"$REF/thirdparty/Sophus"
  -I"$REF/thirdparty/cereal/include"
  -I"$REF/thirdparty/CLI11/include"
  -I"$REF/thirdparty/ceres-solver/include"
  -Ibuild-ceres/config
  -I"$REF/thirdparty/ceres-solver/internal/ceres/miniglog"
  -I"$REF/thirdparty/opengv/include"
  -I/usr/include/opencv4
)
# -std=c++17 -faligned-new (NOT the reference's c++14): the reference keeps
# Sophus::SE3d in plain std::vector (e.g. test_ceres_se3.cpp:99), which under
# -march=native (AVX, EIGEN_MAX_ALIGN_BYTES=32) is undefined behaviour in
# C++14 (malloc's 16-byte alignment) and segfaults here.  C++17's
# aligned-new makes std::allocator honour the Eigen alignas and fixes it
# without modifying the sources.
# -DEIGEN_MAX_ALIGN_BYTES=16: oneTBB's tbb_allocator (and C++14 std::vector)
# never over-aligns beyond malloc's 16 bytes; capping Eigen's alignment
# requirement at 16 (AVX codegen stays, Eigen switches to unaligned loads)
# removes the whole class of alignment crashes.  Must match the Ceres/OpenGV
# builds (see build_submodules.sh:27-46 for the upstream warning about this).
FLAGS=(-std=c++17 -faligned-new -O3 -march=native -DEIGEN_MAX_ALIGN_BYTES=16
       -Wno-deprecated-declarations
       -Wno-unused-function -Wno-maybe-uninitialized)
LIBS=(build-ceres/lib/libceres.a build-opengv/lib/libopengv.a
      -ltbb -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -pthread)

mkdir -p bin
g++ "${FLAGS[@]}" "${INC[@]}" -c pangolin_stub/pangolin_stub.cpp -o bin/pangolin_stub.o
g++ "${FLAGS[@]}" "${INC[@]}" "$REF/src/test_ceres_se3.cpp" bin/pangolin_stub.o "${LIBS[@]}" -o bin/test_ceres_se3
g++ "${FLAGS[@]}" "${INC[@]}" "$REF/src/calibration.cpp" bin/pangolin_stub.o "${LIBS[@]}" -o bin/calibration
g++ "${FLAGS[@]}" "${INC[@]}" "$REF/src/sfm.cpp" bin/pangolin_stub.o "${LIBS[@]}" -o bin/sfm
echo OK
