// Native harness: reference-exact dataset generation + fast validation.
//
// C++ re-implementation of the reference harness's data layer
// (/root/reference/src/data.hpp:55-62, 105-170, 195-310, 393-406 is the
// behavioral spec; this file is written fresh against that spec, not copied).
// Compiling with the system g++/libstdc++ gives datasets BIT-IDENTICAL to
// what the reference harness would generate on this toolchain:
//   * keys: std::mt19937(seed) + std::uniform_int_distribution /
//     uniform_real_distribution / normal_distribution per key type;
//   * payloads: glibc srand(key low bytes) + rand() byte draws;
// plus native-speed oracles (sortedness, payload regeneration, multiset)
// for datasets too large to validate in Python.
//
// Exposed as a plain C ABI consumed via ctypes (utils/native.py).

#include <algorithm>
#include <atomic>
#include <bit>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Threading: the reference is strictly single-threaded (its thesis lists
// multithreading as future work); this runtime is not.  Oracles and bulk
// transforms fan out over hardware threads; generation stays single-stream
// where bit-exactness to the reference protocol requires one RNG sequence.
// ---------------------------------------------------------------------------

int num_threads() {
  unsigned h = std::thread::hardware_concurrency();
  return h ? static_cast<int>(h) : 4;
}

template <typename F>
void parallel_for(int64_t n, F f) {  // f(begin, end), disjoint ranges
  const int t = num_threads();
  if (n < (int64_t{1} << 16) || t <= 1) {
    if (n > 0) f(int64_t{0}, n);
    return;
  }
  const int64_t chunk = (n + t - 1) / t;
  std::vector<std::thread> ths;
  for (int i = 0; i < t; i++) {
    const int64_t b = i * chunk, e = std::min<int64_t>(n, b + chunk);
    if (b >= e) break;
    ths.emplace_back([=] { f(b, e); });
  }
  for (auto &th : ths) th.join();
}

// Thread-safe replica of glibc rand() (TYPE_3 additive feedback, deg=31
// sep=3, random_r.c semantics) so the payload oracle can run one generator
// per row across threads instead of serializing on the global srand state.
// Matches utils/cpp_rng.py (itself validated against glibc).
struct GlibcRand {
  uint32_t st[31];
  int f = 3, r = 0;

  explicit GlibcRand(uint32_t seed) {
    const uint32_t s = seed ? seed : 1u;
    int64_t word = static_cast<int32_t>(s);
    st[0] = static_cast<uint32_t>(word);
    for (int i = 1; i < 31; i++) {
      const int64_t hi = word / 127773;  // C truncating division
      const int64_t lo = word - hi * 127773;
      word = 16807 * lo - 2836 * hi;
      if (word < 0) word += 2147483647;
      st[i] = static_cast<uint32_t>(word);
    }
    for (int k = 0; k < 310; k++) next();  // glibc's 10*deg warm-up discards
  }

  int32_t next() {
    const uint32_t val = st[f] + st[r];
    st[f] = val;
    f = (f + 1) % 31;
    r = (r + 1) % 31;
    return static_cast<int32_t>((val >> 1) & 0x7FFFFFFFu);
  }
};

// Type ids follow simd_radix_sort_tpu.utils.common.KEY_DTYPES order.
enum TypeId {
  U8 = 0, U16 = 1, U32 = 2, U64 = 3,
  I8 = 4, I16 = 5, I32 = 6, I64 = 7,
  F32 = 8, F64 = 9,
};

// Distribution ids follow utils.data.Distribution declaration order.
enum DistId {
  UNIFORM = 0, GAUSSIAN = 1, ZERO = 2, ZERO_ONE = 3,
  SORTED = 4, REVERSE_SORTED = 5, ALMOST_SORTED = 6,
  ALMOST_REVERSE_SORTED = 7,
};

template <typename K>
void fill_uniform(std::mt19937 &gen, K *keys, int64_t n) {
  if constexpr (std::is_integral_v<K>) {
    // char-sized types are UB for uniform_int_distribution per the standard;
    // the reference instantiates them anyway (data.hpp:366-370) and
    // libstdc++ accepts — mirror that for bit-parity.
    std::uniform_int_distribution<K> dist(std::numeric_limits<K>::lowest(),
                                          std::numeric_limits<K>::max());
    for (int64_t i = 0; i < n; i++) keys[i] = dist(gen);
  } else {
    std::uniform_real_distribution<K> dist(K(-1.0), K(1.0));
    for (int64_t i = 0; i < n; i++) keys[i] = dist(gen);
  }
}

template <typename K>
void fill_gaussian(std::mt19937 &gen, K *keys, int64_t n) {
  if constexpr (std::is_integral_v<K>) {
    std::normal_distribution<double> dist(0, 100);
    for (int64_t i = 0; i < n; i++) {
      // double->narrow-int conversion wraps through int64 like gcc emits
      keys[i] = static_cast<K>(static_cast<int64_t>(std::round(dist(gen))));
    }
  } else {
    std::normal_distribution<K> dist(0, 1.0);
    for (int64_t i = 0; i < n; i++) keys[i] = dist(gen);
  }
}

template <typename K>
void make_keys_t(int dist_id, int64_t n, int64_t seed, K *keys) {
  std::mt19937 gen(static_cast<std::mt19937::result_type>(seed));
  switch (dist_id) {
    case ZERO:
      for (int64_t i = 0; i < n; i++) keys[i] = K(0);
      break;
    case ZERO_ONE:
      for (int64_t i = 0; i < n; i++) keys[i] = K(gen() % 2);
      break;
    case UNIFORM:
      fill_uniform(gen, keys, n);
      break;
    case GAUSSIAN:
      fill_gaussian(gen, keys, n);
      break;
    default: {  // sorted family (data.hpp:126-169)
      if constexpr (std::is_integral_v<K>) {
        fill_uniform(gen, keys, n);
      } else {
        fill_gaussian(gen, keys, n);
      }
      const bool reverse =
          dist_id == REVERSE_SORTED || dist_id == ALMOST_REVERSE_SORTED;
      if (reverse) {
        std::sort(keys, keys + n, std::greater<K>());
      } else {
        std::sort(keys, keys + n);
      }
      if (dist_id == ALMOST_SORTED || dist_id == ALMOST_REVERSE_SORTED) {
        const uint64_t swaps =
            n > 1 ? static_cast<uint64_t>(std::exp2(std::log10((double)n)))
                  : 0;
        std::uniform_int_distribution<uint64_t> dist(0, (uint64_t)n - 1);
        for (uint64_t i = 0; i < swaps; i++) {
          std::swap(keys[dist(gen)], keys[dist(gen)]);
        }
      }
    }
  }
}

template <typename K>
bool is_sorted_t(const K *keys, int64_t n, int up) {
  std::atomic<bool> ok{true};
  parallel_for(n, [&](int64_t b, int64_t e) {
    const int64_t lo = std::max<int64_t>(b, 1);
    if (up) {
      for (int64_t i = lo; i < e; i++)
        if (keys[i - 1] > keys[i]) { ok.store(false); return; }
    } else {
      for (int64_t i = lo; i < e; i++)
        if (keys[i - 1] < keys[i]) { ok.store(false); return; }
    }
  });
  return ok.load();
}

unsigned key_seed(const void *key, int key_size) {
  unsigned seed = 0;
  std::memcpy(&seed, key, std::min(key_size, (int)sizeof(unsigned)));
  return seed;
}

}  // namespace

extern "C" {

int srs_element_size(int type_id) {
  switch (type_id) {
    case U8: case I8: return 1;
    case U16: case I16: return 2;
    case U32: case I32: case F32: return 4;
    default: return 8;
  }
}

// Fill `out` (n elements of the keyed type) with reference-protocol keys.
int srs_make_keys(int type_id, int64_t n, int dist_id, int64_t seed,
                  void *out) {
  switch (type_id) {
    case U8:  make_keys_t<uint8_t>(dist_id, n, seed, (uint8_t *)out); break;
    case U16: make_keys_t<uint16_t>(dist_id, n, seed, (uint16_t *)out); break;
    case U32: make_keys_t<uint32_t>(dist_id, n, seed, (uint32_t *)out); break;
    case U64: make_keys_t<uint64_t>(dist_id, n, seed, (uint64_t *)out); break;
    case I8:  make_keys_t<int8_t>(dist_id, n, seed, (int8_t *)out); break;
    case I16: make_keys_t<int16_t>(dist_id, n, seed, (int16_t *)out); break;
    case I32: make_keys_t<int32_t>(dist_id, n, seed, (int32_t *)out); break;
    case I64: make_keys_t<int64_t>(dist_id, n, seed, (int64_t *)out); break;
    case F32: make_keys_t<float>(dist_id, n, seed, (float *)out); break;
    case F64: make_keys_t<double>(dist_id, n, seed, (double *)out); break;
    default: return -1;
  }
  return 0;
}

// Payload protocol (data.hpp:393-406): per element, srand(key low bytes),
// then draw total_bytes bytes with rand(), packed row-major into
// out[n][total_bytes] (caller slices per-payload columns).
int srs_make_payload_bytes(int key_size, const void *keys, int64_t n,
                           int32_t total_bytes, uint8_t *out) {
  const uint8_t *kb = (const uint8_t *)keys;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      GlibcRand g(key_seed(kb + i * key_size, key_size));
      uint8_t *row = out + i * total_bytes;
      for (int32_t b = 0; b < total_bytes; b++) row[b] = (uint8_t)g.next();
    }
  });
  return 0;
}

// checkPayloads (data.hpp:249-270): regenerate per key, compare packed rows.
// Returns index of first bad row, or -1 if all match.
int64_t srs_check_payload_bytes(int key_size, const void *keys, int64_t n,
                                int32_t total_bytes, const uint8_t *packed) {
  const uint8_t *kb = (const uint8_t *)keys;
  std::atomic<int64_t> bad{-1};
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    std::vector<uint8_t> row(total_bytes);
    for (int64_t i = lo; i < hi; i++) {
      GlibcRand g(key_seed(kb + i * key_size, key_size));
      for (int32_t b = 0; b < total_bytes; b++) row[b] = (uint8_t)g.next();
      if (std::memcmp(row.data(), packed + i * total_bytes,
                      total_bytes) != 0) {
        int64_t cur = bad.load();  // keep the smallest failing index
        while ((cur == -1 || i < cur) &&
               !bad.compare_exchange_weak(cur, i)) {
        }
        return;
      }
    }
  });
  return bad.load();
}

// isSorted (data.hpp:195-220): numeric comparison order per key type.
int srs_is_sorted(int type_id, const void *keys, int64_t n, int up) {
  switch (type_id) {
    case U8:  return is_sorted_t((const uint8_t *)keys, n, up);
    case U16: return is_sorted_t((const uint16_t *)keys, n, up);
    case U32: return is_sorted_t((const uint32_t *)keys, n, up);
    case U64: return is_sorted_t((const uint64_t *)keys, n, up);
    case I8:  return is_sorted_t((const int8_t *)keys, n, up);
    case I16: return is_sorted_t((const int16_t *)keys, n, up);
    case I32: return is_sorted_t((const int32_t *)keys, n, up);
    case I64: return is_sorted_t((const int64_t *)keys, n, up);
    case F32: return is_sorted_t((const float *)keys, n, up);
    case F64: return is_sorted_t((const double *)keys, n, up);
    default: return -1;
  }
}

// Two-sided key multiset check via sorted byte-pattern comparison
// (strict version of checkThatEveryKeyIsThere, data.hpp:222-229).
int srs_same_multiset(int type_id, const void *a, const void *b, int64_t n) {
  const int es = srs_element_size(type_id);
  // compare as unsigned carriers of the same width (bit multiset)
  auto cmp = [&](auto tag) {
    using U = decltype(tag);
    std::vector<U> va((const U *)a, (const U *)a + n);
    std::vector<U> vb((const U *)b, (const U *)b + n);
    std::sort(va.begin(), va.end());
    std::sort(vb.begin(), vb.end());
    return va == vb ? 1 : 0;
  };
  switch (es) {
    case 1: return cmp(uint8_t{});
    case 2: return cmp(uint16_t{});
    case 4: return cmp(uint32_t{});
    case 8: return cmp(uint64_t{});
    default: return -1;
  }
}

// SoA -> AoS: interleave a key column and payload columns into packed rows
// (convertToSingleArray, data.hpp:332-346), threaded.  `cols` = key pointer
// followed by payload pointers; `sizes` their element sizes; row stride =
// sum of sizes (callers pad to a power of two like DataElement when
// required).
int srs_pack_rows(int ncols, const void **cols, const int32_t *sizes,
                  int64_t n, uint8_t *out) {
  int32_t stride = 0;
  for (int c = 0; c < ncols; c++) stride += sizes[c];
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      uint8_t *row = out + i * stride;
      for (int c = 0; c < ncols; c++) {
        std::memcpy(row, (const uint8_t *)cols[c] + i * sizes[c], sizes[c]);
        row += sizes[c];
      }
    }
  });
  return stride;
}

// AoS -> SoA: split packed rows back into columns (setFromSingleArray,
// data.hpp:348-361), threaded.
int srs_unpack_rows(int ncols, void **cols, const int32_t *sizes, int64_t n,
                    const uint8_t *packed) {
  int32_t stride = 0;
  for (int c = 0; c < ncols; c++) stride += sizes[c];
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      const uint8_t *row = packed + i * stride;
      for (int c = 0; c < ncols; c++) {
        std::memcpy((uint8_t *)cols[c] + i * sizes[c], row, sizes[c]);
        row += sizes[c];
      }
    }
  });
  return stride;
}


// ---------------------------------------------------------------------------
// Native LSD byte-radix argsort — the framework's own vendored-baseline
// equivalent (the role bramas/blacher/IPP play in the reference suite,
// sort_methods.hpp:270-347): a real native-code sorter driven through the
// same method facade.  Operates on the order-preserving unsigned carrier
// the Python side already produces (utils/transforms.py); returns the
// stable sorting permutation so payload streams of any dtype can be
// gathered vectorized in NumPy.
//
// Threaded classic parallel LSD: per-pass [thread][256] histograms, an
// exclusive scan over (digit, thread), then each thread scatters its range
// at its precomputed offsets — stable because thread ranges preserve input
// order within a digit.
int srs_radix_argsort(int key_size, const void *keys, int64_t n,
                      int64_t *perm_out) {
  if (key_size != 1 && key_size != 2 && key_size != 4 && key_size != 8)
    return -1;
  if (n <= 0) return 0;
  const uint8_t *kb = (const uint8_t *)keys;
  auto key_at = [&](int64_t i) -> uint64_t {
    uint64_t v = 0;
    std::memcpy(&v, kb + i * key_size, key_size);  // little-endian
    return v;
  };
  std::vector<uint64_t> ka((size_t)n), kbuf((size_t)n);
  std::vector<int64_t> ia((size_t)n), ibuf((size_t)n);
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      ka[(size_t)i] = key_at(i);
      ia[(size_t)i] = i;
    }
  });

  const int t = num_threads();
  const int64_t chunk = (n + t - 1) / t;
  std::vector<int64_t> counts((size_t)t * 256);
  for (int pass = 0; pass < key_size; pass++) {
    const int shift = 8 * pass;
    std::fill(counts.begin(), counts.end(), 0);
    {
      std::vector<std::thread> ths;
      for (int w = 0; w < t; w++) {
        ths.emplace_back([&, w]() {
          int64_t lo = w * chunk, hi = std::min<int64_t>(n, lo + chunk);
          int64_t *c = counts.data() + (size_t)w * 256;
          for (int64_t i = lo; i < hi; i++)
            c[(ka[(size_t)i] >> shift) & 0xFF]++;
        });
      }
      for (auto &th : ths) th.join();
    }
    // exclusive scan in (digit, thread) order keeps the pass stable
    int64_t sum = 0;
    for (int d = 0; d < 256; d++) {
      for (int w = 0; w < t; w++) {
        int64_t &c = counts[(size_t)w * 256 + d];
        int64_t v = c;
        c = sum;
        sum += v;
      }
    }
    {
      std::vector<std::thread> ths;
      for (int w = 0; w < t; w++) {
        ths.emplace_back([&, w]() {
          int64_t lo = w * chunk, hi = std::min<int64_t>(n, lo + chunk);
          int64_t *c = counts.data() + (size_t)w * 256;
          for (int64_t i = lo; i < hi; i++) {
            int64_t pos = c[(ka[(size_t)i] >> shift) & 0xFF]++;
            kbuf[(size_t)pos] = ka[(size_t)i];
            ibuf[(size_t)pos] = ia[(size_t)i];
          }
        });
      }
      for (auto &th : ths) th.join();
    }
    ka.swap(kbuf);
    ia.swap(ibuf);
  }
  std::memcpy(perm_out, ia.data(), (size_t)n * sizeof(int64_t));
  return 0;
}

}  // extern "C"
