// Minimal boost::disjoint_sets shim (original code, API-compatible subset:
// pointer-based rank/parent storage, union by rank, path compression) used
// ONLY to compile the upstream reference library out-of-tree.
#ifndef VST_SHIM_BOOST_DISJOINT_SETS_HPP_
#define VST_SHIM_BOOST_DISJOINT_SETS_HPP_


#include <cstddef>
namespace boost {

template <typename RankPA, typename ParentPA>
class disjoint_sets {
 public:
  disjoint_sets(RankPA rank, ParentPA parent) : rank_(rank), parent_(parent) {}

  template <typename Element>
  void make_set(Element x) {
    parent_[x] = x;
    rank_[x] = 0;
  }

  template <typename Element>
  Element find_set(Element x) {
    Element root = x;
    while (parent_[root] != root) root = parent_[root];
    while (parent_[x] != root) {
      Element next = parent_[x];
      parent_[x] = root;
      x = next;
    }
    return root;
  }

  template <typename Element>
  void link(Element x, Element y) {
    if (x == y) return;
    if (rank_[x] < rank_[y]) {
      parent_[x] = y;
    } else if (rank_[x] > rank_[y]) {
      parent_[y] = x;
    } else {
      parent_[y] = x;
      ++rank_[x];
    }
  }

  template <typename Element>
  void union_set(Element x, Element y) {
    link(find_set(x), find_set(y));
  }

  template <typename ElementIterator>
  std::size_t count_sets(ElementIterator first, ElementIterator last) {
    std::size_t count = 0;
    for (; first != last; ++first) {
      if (parent_[*first] == *first) ++count;
    }
    return count;
  }

 private:
  RankPA rank_;
  ParentPA parent_;
};

}  // namespace boost

#endif  // VST_SHIM_BOOST_DISJOINT_SETS_HPP_
