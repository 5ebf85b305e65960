// Golden-output driver for the upstream reference segmentation library.
//
// Original code (part of video_segment_tpu's validation harness).  Links
// against the reference's segmentation core (built out-of-tree by build.sh)
// and drives DenseSegmentation -> RegionSegmentation -> SegmentationWriter
// exactly the way seg_tree_sample's unit graph does
// (reference seg_tree_sample/seg_tree.cpp:109-325,
//  segmentation/segmentation_unit.cpp:118-177,240-330,333-416), but reads
// frames from a directory of PNG images (dumped by make_golden.py via cv2)
// instead of FFmpeg, since the build image has no FFmpeg.
//
// Usage:
//   golden_driver --frames_dir /tmp/frames --output /tmp/golden.pb \
//                 [--max_frames N] [--over_segment] [--flow_file f.flow]
//
// The emitted .pb uses the same chunked container as the reference
// (segment_util/segmentation_io.h:31-66) and keeps rasterization +
// vectorization so it can score boundary F-measure.

#include <dirent.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <fstream>
#include <memory>
#include <string>
#include <vector>

#include <gflags/gflags.h>
#include <glog/logging.h>
#include <opencv2/core/core.hpp>
#include <opencv2/imgcodecs.hpp>

#include "segmentation/dense_segmentation.h"
#include "segmentation/region_segmentation.h"
#include "segment_util/segmentation_io.h"
#include "segment_util/segmentation_util.h"

DEFINE_string(frames_dir, "", "Directory of frame_%06d.png images");
DEFINE_string(output, "/tmp/golden.pb", "Output .pb path");
DEFINE_int32(max_frames, 0, "Limit on frames (0 = all)");
DEFINE_bool(over_segment, false, "Stop after dense over-segmentation");
DEFINE_string(flow_file, "",
              "Optional raw backward-flow file: per frame pair "
              "H*W*2 float32 (x, y), as written by make_golden.py");

namespace {

std::vector<std::string> ListFrames(const std::string& dir) {
  std::vector<std::string> files;
  DIR* d = opendir(dir.c_str());
  CHECK(d != nullptr) << "cannot open " << dir;
  while (dirent* e = readdir(d)) {
    std::string name(e->d_name);
    if (name.size() > 4 && name.substr(name.size() - 4) == ".png") {
      files.push_back(dir + "/" + name);
    }
  }
  closedir(d);
  std::sort(files.begin(), files.end());
  return files;
}

}  // namespace

int main(int argc, char** argv) {
  google::InitGoogleLogging(argv[0]);
  google::ParseCommandLineFlags(&argc, &argv, true);
  CHECK(!FLAGS_frames_dir.empty()) << "--frames_dir required";

  std::vector<std::string> frames = ListFrames(FLAGS_frames_dir);
  CHECK(!frames.empty()) << "no .png frames in " << FLAGS_frames_dir;
  if (FLAGS_max_frames > 0 &&
      static_cast<int>(frames.size()) > FLAGS_max_frames) {
    frames.resize(FLAGS_max_frames);
  }

  cv::Mat first = cv::imread(frames[0], cv::IMREAD_COLOR);
  CHECK(!first.empty());
  const int width = first.cols;
  const int height = first.rows;
  LOG(INFO) << "Processing " << frames.size() << " frames at " << width << "x"
            << height;

  std::ifstream flow_stream;
  const bool use_flow = !FLAGS_flow_file.empty();
  if (use_flow) {
    flow_stream.open(FLAGS_flow_file, std::ios::binary);
    CHECK(flow_stream.good()) << "cannot open " << FLAGS_flow_file;
  }

  // Defaults match seg_tree_sample (dense_segmentation.h:42-95,
  // region_segmentation.h:41-82).
  segmentation::DenseSegmentationOptions dense_options;
  segmentation::RegionSegmentationOptions region_options;

  segmentation::DenseSegmentation dense_seg(dense_options, width, height);
  std::unique_ptr<segmentation::RegionSegmentation> region_seg;
  if (!FLAGS_over_segment) {
    region_seg.reset(new segmentation::RegionSegmentation(region_options,
                                                          width, height));
  }

  segmentation::SegmentationWriter writer(FLAGS_output);
  std::vector<int> header_entries;
  header_entries.push_back(1);  // vectorization written
  header_entries.push_back(0);  // no shape moments
  CHECK(writer.OpenFile(header_entries));

  // Frames buffered for the region stage (it consumes dense results with
  // its own features; mirror RegionSegmentationUnit's buffering,
  // segmentation_unit.cpp:240-330).
  std::vector<cv::Mat> buffered_images;
  int region_input_idx = 0;
  int64_t out_pts = 0;

  for (size_t k = 0; k < frames.size(); ++k) {
    cv::Mat image = cv::imread(frames[k], cv::IMREAD_COLOR);
    CHECK(!image.empty()) << frames[k];
    CHECK_EQ(width, image.cols);
    CHECK_EQ(height, image.rows);
    const bool flush = (k + 1 == frames.size());

    std::vector<cv::Mat> features = {image};
    cv::Mat flow;
    if (use_flow && k > 0) {
      flow.create(height, width, CV_32FC2);
      flow_stream.read(reinterpret_cast<char*>(flow.data),
                       static_cast<std::streamsize>(height) * width * 2 *
                           sizeof(float));
      CHECK(flow_stream.good()) << "flow file too short at frame " << k;
    }

    std::vector<std::unique_ptr<segmentation::SegmentationDesc>> dense_out;
    // Flow contract (dense_segmentation.cpp:128-142): when flow is in use,
    // EVERY frame passes a Mat — frame 0's must be empty, later frames real.
    dense_seg.ProcessFrame(flush, &features, use_flow ? &flow : nullptr,
                           &dense_out);
    buffered_images.push_back(image.clone());

    if (FLAGS_over_segment) {
      for (auto& desc : dense_out) {
        writer.AddSegmentationToChunk(*desc, out_pts++);
      }
      continue;
    }

    for (size_t i = 0; i < dense_out.size(); ++i) {
      const bool region_flush =
          flush && (i + 1 == dense_out.size());
      std::vector<cv::Mat> region_features = {
          buffered_images[region_input_idx], cv::Mat()};
      ++region_input_idx;
      std::vector<std::unique_ptr<segmentation::SegmentationDesc>> region_out;
      region_seg->ProcessFrame(region_flush, dense_out[i].get(),
                               &region_features, &region_out);
      for (auto& desc : region_out) {
        writer.AddSegmentationToChunk(*desc, out_pts++);
      }
    }
    // Drop images already consumed to bound memory.
    if (region_input_idx > 0 &&
        region_input_idx == static_cast<int>(buffered_images.size())) {
      buffered_images.clear();
      region_input_idx = 0;
    }
  }

  writer.WriteTermHeaderAndClose();
  LOG(INFO) << "Wrote " << out_pts << " frames to " << FLAGS_output;
  printf("__GOLDEN_DONE__ frames=%lld output=%s\n",
         static_cast<long long>(out_pts), FLAGS_output.c_str());
  return 0;
}
