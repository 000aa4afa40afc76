// Shim for the reference's vendored pdqsort (CPM-fetched, unavailable in this
// zero-egress environment): forwards to std::sort.  Sorting semantics are
// identical for the harness's purposes (tools/ref_validate.cc never builds
// CAPT structures; Environment::sort ordering by min_distance is equivalent
// up to ties, which the early-break in validity.hh treats identically).
#pragma once
#include <algorithm>

template <class Iter>
inline void pdqsort(Iter begin, Iter end)
{
    std::sort(begin, end);
}

template <class Iter, class Compare>
inline void pdqsort(Iter begin, Iter end, Compare comp)
{
    std::sort(begin, end, comp);
}

template <class Iter>
inline void pdqsort_branchless(Iter begin, Iter end)
{
    std::sort(begin, end);
}

template <class Iter, class Compare>
inline void pdqsort_branchless(Iter begin, Iter end, Compare comp)
{
    std::sort(begin, end, comp);
}
