// Same-host timing of the ACTUAL reference implementation (VERDICT r02
// item 4): compiles /root/reference/src/* and runs ITS OWN perf protocol
// (perf.hpp:28-89: reps = max(1, 2^22/n), warmups = max(1, 2^18/n),
// CLOCK_PROCESS_CPUTIME_ID, fresh Data per rep, mean ns/elem) for the
// headline key/payload combos, so RESULTS.md can carry a measured-here
// reference column next to the published thesis numbers.
//
// Build (scripts/ref_perf.py drives this):
//   g++ -std=c++20 -O2 -mavx512f -mavx512bw -mavx512dq -mavx512vl \
//       -mavx512vbmi -mavx512vbmi2 -I/root/reference/src ref_perf.cpp
//
// Output: one JSON line per cell:
//   {"combo": "float+int32", "dist": "Uniform", "n": 262144,
//    "method": "RadixSIMD", "ns_per_elem": 4.21}

#include <cstdint>
#include <cstdlib>
#include <iostream>
#include <string>

#include "perf.hpp"

using namespace simd_sort;

using RadixSIMD = SortMethodRadixSort<radix_sort::BitSorterSIMD<false>,
                                      CmpSorterInsertionSort>;
using RadixSeq = SortMethodRadixSort<radix_sort::BitSorterSequential,
                                     CmpSorterInsertionSort>;

static std::size_t g_n = 1 << 18;

template <typename M, typename K, typename... Ps>
void cell(const char *combo, InputDistribution dist, const char *distName) {
  // round 4: the vendored baselines join the driver so the losing rows
  // get same-host best-other anchors (Blacher: int32; Bramas:
  // int/double +- same-type payload).  Skip unsupported combos the way
  // the reference harness does (capability predicate, test.cpp:80) and
  // keep its Bramas constant-input O(n^2) guard (perf.hpp:193-203).
  if constexpr (!M::template isSupported<true, K, Ps...>()) {
    return;
  } else {
    if (std::is_same_v<M, SortMethodBramas> &&
        (dist == InputDistribution::Zero ||
         dist == InputDistribution::ZeroOne ||
         dist == InputDistribution::Sorted) &&
        g_n > (1 << 18)) {
      return;
    }
    const double ns = measureTimePerElementWithRepsAndWarmup<M, K, Ps...>(
        g_n, dist);
    std::cout << "{\"combo\": \"" << combo << "\", \"dist\": \"" << distName
              << "\", \"n\": " << g_n << ", \"method\": \"" << M::name()
              << "\", \"ns_per_elem\": " << ns << "}" << std::endl;
  }
}

template <typename K, typename... Ps>
void combo(const char *name) {
  const InputDistribution dists[] = {
      InputDistribution::Uniform,      InputDistribution::Gaussian,
      InputDistribution::Zero,         InputDistribution::ZeroOne,
      InputDistribution::Sorted,       InputDistribution::ReverseSorted,
      InputDistribution::AlmostSorted, InputDistribution::AlmostReverseSorted};
  const char *distNames[] = {"Uniform", "Gaussian", "Zero", "ZeroOne",
                             "Sorted",  "ReverseSorted", "AlmostSorted",
                             "AlmostReverseSorted"};
  for (int i = 0; i < 8; i++) {
    cell<RadixSeq, K, Ps...>(name, dists[i], distNames[i]);
    cell<RadixSIMD, K, Ps...>(name, dists[i], distNames[i]);
    cell<SortMethodSTLSort, K, Ps...>(name, dists[i], distNames[i]);
    cell<SortMethodBlacher, K, Ps...>(name, dists[i], distNames[i]);
    cell<SortMethodBramas, K, Ps...>(name, dists[i], distNames[i]);
  }
}

int main(int argc, char **argv) {
  if (argc > 1) g_n = std::strtoull(argv[1], nullptr, 10);
  const std::string only = argc > 2 ? argv[2] : "";
  auto want = [&](const char *name) { return only.empty() || only == name; };

  if (want("float")) combo<float>("float");
  if (want("double")) combo<double>("double");
  if (want("int8")) combo<int8_t>("int8");
  if (want("uint8")) combo<uint8_t>("uint8");
  if (want("int16")) combo<int16_t>("int16");
  if (want("int32")) combo<int32_t>("int32");
  if (want("int64")) combo<int64_t>("int64");
  if (want("float+int32")) combo<float, int32_t>("float+int32");
  if (want("double+double")) combo<double, double>("double+double");
  if (want("int32+int32")) combo<int32_t, int32_t>("int32+int32");
  if (want("uint64+uint64")) combo<uint64_t, uint64_t>("uint64+uint64");
  return 0;
}
