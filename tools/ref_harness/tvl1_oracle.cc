// DualTVL1 optical-flow oracle for the flow quality tests.
//
// The reference computes dense flow with OpenCV's DualTVL1 at warps=2,
// iterations=10 (video_framework/flow_reader.cpp:190-192,
// seg_tree_sample/seg_tree.cpp:174-175).  The Python cv2 in this image has
// no contrib/optflow module, but the system C++ OpenCV (4.6) ships
// libopencv_optflow — so the oracle is this tiny binary: it runs the very
// algorithm the reference uses and writes a Middlebury .flo file that
// tests/test_flow.py scores our JAX TV-L1 against.
//
// Parameter mapping 2.4 -> 4.6: the reference's string-API
// set("iterations", 10) bounds the legacy scheme's fixed-point iterations
// per warp; the 4.6 split (outer x inner) is closest at
// setOuterIterations(10) with the default inner count.  warps maps 1:1.
#include <cstdio>
#include <cstring>
#include <string>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/optflow.hpp>

int main(int argc, char** argv) {
  std::string i0_path, i1_path, out_path;
  int warps = 2, iterations = 10;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto val = [&](const char* k) -> const char* {
      size_t n = strlen(k);
      return a.compare(0, n, k) == 0 ? a.c_str() + n : nullptr;
    };
    if (const char* v = val("--i0=")) i0_path = v;
    else if (const char* v = val("--i1=")) i1_path = v;
    else if (const char* v = val("--out=")) out_path = v;
    else if (const char* v = val("--warps=")) warps = atoi(v);
    else if (const char* v = val("--iterations=")) iterations = atoi(v);
    else { fprintf(stderr, "unknown arg %s\n", a.c_str()); return 2; }
  }
  if (i0_path.empty() || i1_path.empty() || out_path.empty()) {
    fprintf(stderr,
            "usage: tvl1_oracle --i0=a.png --i1=b.png --out=flow.flo "
            "[--warps=2] [--iterations=10]\n");
    return 2;
  }
  cv::Mat i0 = cv::imread(i0_path, cv::IMREAD_GRAYSCALE);
  cv::Mat i1 = cv::imread(i1_path, cv::IMREAD_GRAYSCALE);
  if (i0.empty() || i1.empty()) {
    fprintf(stderr, "failed to read inputs\n");
    return 1;
  }
  auto tvl1 = cv::optflow::createOptFlow_DualTVL1();
  tvl1->setWarpingsNumber(warps);
  tvl1->setOuterIterations(iterations);
  cv::Mat flow;
  // Flow from i0 to i1 (the reference computes backward flow by passing
  // (curr, prev); direction is the caller's choice of i0/i1).
  tvl1->calc(i0, i1, flow);

  FILE* f = fopen(out_path.c_str(), "wb");
  if (!f) { fprintf(stderr, "cannot open %s\n", out_path.c_str()); return 1; }
  int32_t w = flow.cols, h = flow.rows;
  fwrite("PIEH", 1, 4, f);
  fwrite(&w, 4, 1, f);
  fwrite(&h, 4, 1, f);
  for (int y = 0; y < h; ++y)
    fwrite(flow.ptr<float>(y), sizeof(float), 2 * w, f);
  fclose(f);
  fprintf(stderr, "wrote %s (%dx%d)\n", out_path.c_str(), w, h);
  return 0;
}
