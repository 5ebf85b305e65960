#!/bin/bash
# Build the upstream reference segmentation core out-of-tree (into /tmp)
# together with golden_driver.cc, using the shim headers in ./shim for
# glog/gflags/boost (none of which are installed in this image).
#
# The reference sources under /root/reference are compiled read-only and
# never copied; see tools/ref_harness/README.md.
set -euo pipefail

REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=${BUILD:-/tmp/refbuild}
mkdir -p "$BUILD/gen/segment_util" "$BUILD/obj"

# 1. Generate protobuf code.
protoc --proto_path="$REF/segment_util" \
       --cpp_out="$BUILD/gen/segment_util" \
       "$REF/segment_util/segmentation.proto"

# 1b. Patched build copies (live only in /tmp, never committed):
# GCC parses default arguments of nested-class member functions only at the
# end of the outermost class, so std::is_default_constructible<EdgeHasher>
# is false when the unordered_map member is instantiated under libstdc++ 12
# (worked with the pre-C++17 libstdc++ the reference targeted).  Declare an
# explicit default constructor instead — behavior identical.
mkdir -p "$BUILD/patched/segmentation"
sed 's/EdgeHasher(int neighbors_per_region_ = 23)/EdgeHasher() : EdgeHasher(23) {}\n    EdgeHasher(int neighbors_per_region_)/' \
    "$REF/segmentation/region_segmentation_graph.h" \
    > "$BUILD/patched/segmentation/region_segmentation_graph.h"

CXX=${CXX:-g++}
CXXFLAGS="-O2 -std=c++14 -fopenmp -w
  -include $HERE/shim/vst_compat.h
  -I$HERE/shim -I$BUILD/patched -I$BUILD/patched/segmentation
  -I$REF -I$REF/segmentation -I$BUILD/gen
  -I/usr/include/opencv4"
LIBS="-lprotobuf -lopencv_core -lopencv_imgproc -lopencv_imgcodecs -lpthread"

SOURCES=(
  "$BUILD/gen/segment_util/segmentation.pb.cc"
  "$REF/base/base.cpp"
  "$REF/base/base_impl.cpp"
  "$REF/imagefilter/image_filter.cpp"
  "$REF/segment_util/segmentation_boundary.cpp"
  "$REF/segment_util/segmentation_io.cpp"
  "$REF/segment_util/segmentation_render.cpp"
  "$REF/segment_util/segmentation_util.cpp"
  "$REF/segmentation/boundary.cpp"
  "$REF/segmentation/dense_seg_graph_interface.cpp"
  "$REF/segmentation/dense_segmentation.cpp"
  "$REF/segmentation/dense_segmentation_graph.cpp"
  "$REF/segmentation/histograms.cpp"
  "$REF/segmentation/pixel_distance.cpp"
  "$REF/segmentation/region_descriptor.cpp"
  "$REF/segmentation/region_segmentation.cpp"
  "$REF/segmentation/region_segmentation_graph.cpp"
  "$REF/segmentation/segmentation.cpp"
  "$REF/segmentation/segmentation_common.cpp"
  "$REF/segmentation/segmentation_graph.cpp"
)

OBJS=()
for src in "${SOURCES[@]}" "$HERE/golden_driver.cc" "$HERE/pb_inspect.cc" \
           "$HERE/strip_probe.cc"; do
  obj="$BUILD/obj/$(basename "${src%.*}").o"
  if [[ ! -f "$obj" || "$src" -nt "$obj" ]]; then
    echo "CXX $(basename "$src")"
    # shellcheck disable=SC2086
    $CXX $CXXFLAGS -c "$src" -o "$obj"
  fi
  OBJS+=("$obj")
done

LIB_OBJS=("${OBJS[@]:0:${#SOURCES[@]}}")

echo "LINK golden_driver"
# shellcheck disable=SC2086
$CXX -fopenmp "${LIB_OBJS[@]}" "$BUILD/obj/golden_driver.o" \
     -o "$BUILD/golden_driver" $LIBS
echo "LINK pb_inspect"
# shellcheck disable=SC2086
$CXX -fopenmp "${LIB_OBJS[@]}" "$BUILD/obj/pb_inspect.o" \
     -o "$BUILD/pb_inspect" $LIBS
echo "LINK strip_probe"
# shellcheck disable=SC2086
$CXX -fopenmp "${LIB_OBJS[@]}" "$BUILD/obj/strip_probe.o" \
     -o "$BUILD/strip_probe" $LIBS
# Standalone DualTVL1 oracle (needs only OpenCV; no reference sources).
echo "LINK tvl1_oracle"
$CXX -O2 -w -I/usr/include/opencv4 "$HERE/tvl1_oracle.cc" \
     -o "$BUILD/tvl1_oracle" \
     -lopencv_core -lopencv_imgcodecs -lopencv_imgproc -lopencv_optflow
echo "Built $BUILD/golden_driver $BUILD/pb_inspect $BUILD/strip_probe" \
     "$BUILD/tvl1_oracle"
