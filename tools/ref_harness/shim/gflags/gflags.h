// Minimal gflags-compatible shim (original code, API-compatible subset) used
// ONLY to compile the upstream reference library out-of-tree for golden
// output generation.  Supports --name=value, --name value, --noname.
#ifndef VST_SHIM_GFLAGS_GFLAGS_H_
#define VST_SHIM_GFLAGS_GFLAGS_H_

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <functional>
#include <iostream>
#include <map>
#include <string>
#include <vector>

namespace gflags_shim {

using Setter = std::function<bool(const std::string&)>;

inline std::map<std::string, Setter>& registry() {
  static std::map<std::string, Setter> r;
  return r;
}

struct Registrar {
  Registrar(const char* name, Setter s) { registry()[name] = std::move(s); }
};

inline bool parse_value(const std::string& v, bool* out) {
  if (v == "true" || v == "1" || v == "yes" || v.empty()) *out = true;
  else if (v == "false" || v == "0" || v == "no") *out = false;
  else return false;
  return true;
}
inline bool parse_value(const std::string& v, int32_t* out) {
  *out = static_cast<int32_t>(std::strtol(v.c_str(), nullptr, 10));
  return true;
}
inline bool parse_value(const std::string& v, int64_t* out) {
  *out = std::strtoll(v.c_str(), nullptr, 10);
  return true;
}
inline bool parse_value(const std::string& v, double* out) {
  *out = std::strtod(v.c_str(), nullptr);
  return true;
}
inline bool parse_value(const std::string& v, std::string* out) {
  *out = v;
  return true;
}

inline uint32_t ParseFlags(int* argc, char*** argv, bool remove_flags) {
  std::vector<char*> kept;
  kept.push_back((*argv)[0]);
  for (int i = 1; i < *argc; ++i) {
    std::string arg((*argv)[i]);
    if (arg.rfind("--", 0) != 0) {
      kept.push_back((*argv)[i]);
      continue;
    }
    std::string body = arg.substr(2);
    std::string name, value;
    bool has_value = false;
    size_t eq = body.find('=');
    if (eq != std::string::npos) {
      name = body.substr(0, eq);
      value = body.substr(eq + 1);
      has_value = true;
    } else {
      name = body;
    }
    auto it = registry().find(name);
    if (it == registry().end() && name.rfind("no", 0) == 0 &&
        registry().count(name.substr(2))) {
      it = registry().find(name.substr(2));
      value = "false";
      has_value = true;
    }
    if (it == registry().end()) {
      std::cerr << "WARNING: unknown flag " << arg << "\n";
      continue;
    }
    if (!has_value && i + 1 < *argc && (*argv)[i + 1][0] != '-') {
      value = (*argv)[++i];
    }
    if (!it->second(value)) {
      std::cerr << "ERROR: bad value for flag " << arg << "\n";
      std::exit(1);
    }
  }
  if (remove_flags) {
    for (size_t i = 0; i < kept.size(); ++i) (*argv)[i] = kept[i];
    *argc = static_cast<int>(kept.size());
  }
  return 1;
}

}  // namespace gflags_shim

#define VST_SHIM_DEFINE(type, name, value)                                   \
  type FLAGS_##name = value;                                                 \
  static gflags_shim::Registrar gflags_reg_##name(#name, [](                 \
      const std::string& v) { return gflags_shim::parse_value(v, &FLAGS_##name); });

#define DEFINE_bool(name, value, help) VST_SHIM_DEFINE(bool, name, value)
#define DEFINE_int32(name, value, help) VST_SHIM_DEFINE(int32_t, name, value)
#define DEFINE_int64(name, value, help) VST_SHIM_DEFINE(int64_t, name, value)
#define DEFINE_double(name, value, help) VST_SHIM_DEFINE(double, name, value)
#define DEFINE_string(name, value, help) \
  VST_SHIM_DEFINE(std::string, name, value)

#define DECLARE_bool(name) extern bool FLAGS_##name;
#define DECLARE_int32(name) extern int32_t FLAGS_##name;
#define DECLARE_int64(name) extern int64_t FLAGS_##name;
#define DECLARE_double(name) extern double FLAGS_##name;
#define DECLARE_string(name) extern std::string FLAGS_##name;

namespace google {
inline uint32_t ParseCommandLineFlags(int* argc, char*** argv, bool remove) {
  return gflags_shim::ParseFlags(argc, argv, remove);
}
inline void SetUsageMessage(const std::string&) {}
}  // namespace google

namespace gflags {
using google::ParseCommandLineFlags;
using google::SetUsageMessage;
}  // namespace gflags

#endif  // VST_SHIM_GFLAGS_GFLAGS_H_
