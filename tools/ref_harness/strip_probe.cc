// Dumps the reference's StripToEssentials encoding of each frame of a
// chunked .pb so the rebuild's strip encoder can be byte-compared.
// Original code (video_segment_tpu validation harness).
//
// Usage: strip_probe --input file.pb --output strips.bin [--max_frames N]
// Output: per frame, little-endian int32 length + raw stripped bytes.

#include <cstdint>
#include <cstdio>
#include <fstream>
#include <string>

#include <gflags/gflags.h>
#include <glog/logging.h>

#include "segment_util/segmentation_io.h"
#include "segment_util/segmentation_util.h"

DEFINE_string(input, "", "chunked .pb file");
DEFINE_string(output, "/tmp/strips.bin", "output blob");
DEFINE_int32(max_frames, 8, "frames to strip");

using namespace segmentation;

int main(int argc, char** argv) {
  google::InitGoogleLogging(argv[0]);
  google::ParseCommandLineFlags(&argc, &argv, true);
  CHECK(!FLAGS_input.empty());

  SegmentationReader reader(FLAGS_input);
  CHECK(reader.OpenFileAndReadHeaders());
  std::ofstream out(FLAGS_output, std::ios::binary);
  int n = std::min(FLAGS_max_frames, reader.NumFrames());
  for (int f = 0; f < n; ++f) {
    SegmentationDesc desc;
    CHECK(reader.ReadNextFrame(&desc));
    std::string stripped;
    StripToEssentials(desc, true, false, &stripped);
    int32_t len = static_cast<int32_t>(stripped.size());
    out.write(reinterpret_cast<const char*>(&len), 4);
    out.write(stripped.data(), len);
  }
  printf("__STRIP_PROBE__ frames=%d output=%s\n", n, FLAGS_output.c_str());
  return 0;
}
