// Wire-compatibility probe: opens a chunked segmentation .pb with the
// UPSTREAM REFERENCE reader (segment_util/segmentation_io.h), rebuilds and
// verifies the global hierarchy with the reference's own
// BuildGlobalHierarchy/VerifyGlobalHierarchy, and optionally dumps per-frame
// id images (rendered by the reference's SegmentationDescToIdImage) as
// 24-bit PNGs for cross-implementation boundary-F scoring.
//
// Original code (video_segment_tpu validation harness).
//
// Usage:
//   pb_inspect --input our_output.pb [--dump_dir /tmp/ids --level 0]

#include <cstdint>
#include <cstdio>
#include <string>
#include <vector>

#include <gflags/gflags.h>
#include <glog/logging.h>
#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include "segment_util/segmentation_io.h"
#include "segment_util/segmentation_util.h"

DEFINE_string(input, "", "Chunked .pb file");
DEFINE_string(dump_dir, "", "If set, write per-frame id PNGs here");
DEFINE_int32(level, 0, "Hierarchy level for id rendering");

using namespace segmentation;

int main(int argc, char** argv) {
  google::InitGoogleLogging(argv[0]);
  google::ParseCommandLineFlags(&argc, &argv, true);
  CHECK(!FLAGS_input.empty());

  SegmentationReader reader(FLAGS_input);
  CHECK(reader.OpenFileAndReadHeaders()) << "reference reader failed to open";
  const int num_frames = reader.NumFrames();
  int width = 0, height = 0;
  reader.SegmentationResolution(&width, &height);
  LOG(INFO) << "frames=" << num_frames << " resolution=" << width << "x"
            << height;

  Hierarchy global_hierarchy;
  Hierarchy current_hierarchy;
  int frame_idx = 0;
  int num_chunks = 0;
  int64_t total_regions2d = 0;

  reader.SeekToFrame(0);
  for (int f = 0; f < num_frames; ++f) {
    SegmentationDesc desc;
    CHECK(reader.ReadNextFrame(&desc)) << "read failed at frame " << f;
    CHECK_EQ(width, desc.frame_width());
    CHECK_EQ(height, desc.frame_height());
    if (desc.hierarchy_size() > 0) {
      ++num_chunks;
      current_hierarchy.CopyFrom(desc.hierarchy());
      BuildGlobalHierarchy(desc.hierarchy(), frame_idx, &global_hierarchy);
    }
    total_regions2d += desc.region_size();

    if (!FLAGS_dump_dir.empty()) {
      cv::Mat id_image(height, width, CV_32S);
      SegmentationDescToIdImage(
          FLAGS_level, desc,
          FLAGS_level > 0 ? &current_hierarchy : nullptr, &id_image);
      // Pack int32 ids into 24-bit BGR (same packing as segment_converter's
      // id bitmaps: id = b + (g<<8) + (r<<16)).
      cv::Mat bgr(height, width, CV_8UC3);
      for (int y = 0; y < height; ++y) {
        const int32_t* src = id_image.ptr<int32_t>(y);
        uint8_t* dst = bgr.ptr<uint8_t>(y);
        for (int x = 0; x < width; ++x) {
          int32_t id = src[x];
          dst[3 * x + 0] = id & 0xff;
          dst[3 * x + 1] = (id >> 8) & 0xff;
          dst[3 * x + 2] = (id >> 16) & 0xff;
        }
      }
      char name[64];
      snprintf(name, sizeof(name), "/id_%06d.png", f);
      CHECK(cv::imwrite(FLAGS_dump_dir + name, bgr));
    }
    ++frame_idx;
  }

  bool hierarchy_ok = true;
  if (global_hierarchy.size() > 0) {
    hierarchy_ok = VerifyGlobalHierarchy(global_hierarchy);
  }

  printf("__PB_INSPECT__ frames=%d chunks=%d regions2d=%lld levels=%d "
         "hierarchy_ok=%d\n",
         num_frames, num_chunks, static_cast<long long>(total_regions2d),
         global_hierarchy.size(), hierarchy_ok ? 1 : 0);
  return hierarchy_ok ? 0 : 2;
}
