// Force-included compatibility header for building the upstream reference
// (written against OpenCV 2.x) with the system OpenCV 4.x.
#ifndef VST_SHIM_COMPAT_H_
#define VST_SHIM_COMPAT_H_

#include <algorithm>

#include <opencv2/core/core_c.h>   // IplImage
#include <opencv2/imgproc.hpp>

#ifndef CV_BGR2Lab
#define CV_BGR2Lab cv::COLOR_BGR2Lab
#endif

// The reference was written against toolchains where these were dragged in
// unqualified; modern libstdc++ requires the declarations to be visible.
using std::lower_bound;
using std::upper_bound;

#endif  // VST_SHIM_COMPAT_H_
