// Minimal glog-compatible logging shim (original code, API-compatible subset)
// used ONLY to compile the upstream reference library out-of-tree for golden
// output generation (see tools/ref_harness/README.md).  Not part of the
// video_segment_tpu runtime.
#ifndef VST_SHIM_GLOG_LOGGING_H_
#define VST_SHIM_GLOG_LOGGING_H_

#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

namespace glog_shim {

class LogMessage {
 public:
  LogMessage(const char* file, int line, int severity, const char* prefix = "")
      : severity_(severity) {
    const char* base = file;
    for (const char* p = file; *p; ++p)
      if (*p == '/') base = p + 1;
    stream_ << "[" << "IWEF"[severity & 3] << " " << base << ":" << line
            << "] " << prefix;
  }
  ~LogMessage() {
    stream_ << "\n";
    std::cerr << stream_.str() << std::flush;
    if (severity_ >= 3) std::abort();
  }
  std::ostream& stream() { return stream_; }

 private:
  std::ostringstream stream_;
  int severity_;
};

// Swallows everything streamed into it; used for compiled-out macros.
class NullStream {
 public:
  template <typename T>
  NullStream& operator<<(const T&) {
    return *this;
  }
  NullStream& operator<<(std::ostream& (*)(std::ostream&)) { return *this; }
};

inline NullStream& null_stream() {
  static NullStream s;
  return s;
}

// Binds looser than << so the stream chain completes first.
struct Voidify {
  void operator&(std::ostream&) {}
  void operator&(NullStream&) {}
};

template <typename T>
T* CheckNotNullImpl(const char* file, int line, const char* expr, T* ptr) {
  if (ptr == nullptr) {
    LogMessage(file, line, 3).stream()
        << "Check failed: '" << expr << "' must be non-null";
  }
  return ptr;
}

}  // namespace glog_shim

#define VST_SHIM_LOG_INFO glog_shim::LogMessage(__FILE__, __LINE__, 0)
#define VST_SHIM_LOG_WARNING glog_shim::LogMessage(__FILE__, __LINE__, 1)
#define VST_SHIM_LOG_ERROR glog_shim::LogMessage(__FILE__, __LINE__, 2)
#define VST_SHIM_LOG_FATAL glog_shim::LogMessage(__FILE__, __LINE__, 3)

#define LOG(severity) VST_SHIM_LOG_##severity.stream()
#define LOG_IF(severity, condition) \
  !(condition) ? (void)0 : glog_shim::Voidify() & LOG(severity)

#define CHECK(condition)                          \
  (condition) ? (void)0                           \
              : glog_shim::Voidify() &            \
                    VST_SHIM_LOG_FATAL.stream()   \
                        << "Check failed: " #condition " "

#define VST_SHIM_CHECK_OP(name, op, a, b)                            \
  ((a)op(b)) ? (void)0                                               \
             : glog_shim::Voidify() & VST_SHIM_LOG_FATAL.stream()    \
                   << "Check failed: " #a " " #op " " #b " (" << (a) \
                   << " vs " << (b) << ") "

#define CHECK_EQ(a, b) VST_SHIM_CHECK_OP(EQ, ==, a, b)
#define CHECK_NE(a, b) VST_SHIM_CHECK_OP(NE, !=, a, b)
#define CHECK_LT(a, b) VST_SHIM_CHECK_OP(LT, <, a, b)
#define CHECK_LE(a, b) VST_SHIM_CHECK_OP(LE, <=, a, b)
#define CHECK_GT(a, b) VST_SHIM_CHECK_OP(GT, >, a, b)
#define CHECK_GE(a, b) VST_SHIM_CHECK_OP(GE, >=, a, b)
#define CHECK_NOTNULL(ptr) \
  glog_shim::CheckNotNullImpl(__FILE__, __LINE__, #ptr, (ptr))
#define CHECK_NEAR(a, b, tol)                            \
  (std::abs((a) - (b)) <= (tol))                         \
      ? (void)0                                          \
      : glog_shim::Voidify() & VST_SHIM_LOG_FATAL.stream() \
            << "Check failed: |" #a " - " #b "| <= " #tol " "

// Debug-only checks compile out (matches glog under NDEBUG); arguments are
// not evaluated.  Define VST_SHIM_DEBUG_CHECKS to turn them into CHECKs.
#ifdef VST_SHIM_DEBUG_CHECKS
#define DCHECK(c) CHECK(c)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#define DCHECK_NEAR(a, b, tol) CHECK_NEAR(a, b, tol)
#else
#define DCHECK(c) glog_shim::null_stream()
#define DCHECK_EQ(a, b) glog_shim::null_stream()
#define DCHECK_NE(a, b) glog_shim::null_stream()
#define DCHECK_LT(a, b) glog_shim::null_stream()
#define DCHECK_LE(a, b) glog_shim::null_stream()
#define DCHECK_GT(a, b) glog_shim::null_stream()
#define DCHECK_GE(a, b) glog_shim::null_stream()
#define DCHECK_NEAR(a, b, tol) glog_shim::null_stream()
#endif

#define VLOG(n) glog_shim::null_stream()
#define DLOG(severity) glog_shim::null_stream()

namespace google {
inline void InitGoogleLogging(const char*) {}
inline void InstallFailureSignalHandler() {}
}  // namespace google

#endif  // VST_SHIM_GLOG_LOGGING_H_
