// Minimal boost::lexical_cast shim (original code) used ONLY to compile the
// upstream reference library out-of-tree.
#ifndef VST_SHIM_BOOST_LEXICAL_CAST_HPP_
#define VST_SHIM_BOOST_LEXICAL_CAST_HPP_

#include <sstream>
#include <string>

namespace boost {

template <typename Target, typename Source>
Target lexical_cast(const Source& src) {
  std::stringstream ss;
  ss << src;
  Target out;
  ss >> out;
  return out;
}

template <typename Source>
std::string lexical_cast_to_string(const Source& src) {
  std::ostringstream ss;
  ss << src;
  return ss.str();
}

template <>
inline std::string lexical_cast<std::string, int>(const int& src) {
  return std::to_string(src);
}

}  // namespace boost

#endif  // VST_SHIM_BOOST_LEXICAL_CAST_HPP_
