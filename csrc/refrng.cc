// Reference-RNG shim: exposes the exact ``std::mt19937`` +
// libstdc++ distribution algorithms the reference uses for episode
// sampling (/root/reference/csrc/liars_dice/recursive_solving.cc:168-216:
// uniform_int_distribution<>, uniform_real_distribution<float>,
// discrete_distribution<>) through a C API, so fixed-seed self-play
// trajectories can be replicated bit-for-bit from Python for parity
// tests.  The distributions are implementation-defined in C++; linking
// the real libstdc++ is the faithful way to reproduce them.

#include <random>

extern "C" {

void* refrng_create(unsigned seed) { return new std::mt19937(seed); }

void refrng_destroy(void* h) { delete static_cast<std::mt19937*>(h); }

// uniform_int_distribution<>(lo, hi) — inclusive bounds.
int refrng_uniform_int(void* h, int lo, int hi) {
  auto* g = static_cast<std::mt19937*>(h);
  return std::uniform_int_distribution<>(lo, hi)(*g);
}

// uniform_real_distribution<float>(0, 1).
float refrng_uniform_float(void* h) {
  auto* g = static_cast<std::mt19937*>(h);
  return std::uniform_real_distribution<float>(0, 1)(*g);
}

// discrete_distribution<>(weights, weights + n).
int refrng_discrete(void* h, const double* weights, int n) {
  auto* g = static_cast<std::mt19937*>(h);
  std::discrete_distribution<> dis(weights, weights + n);
  return dis(*g);
}

// Raw engine output (for direct mt19937 checks).
unsigned refrng_raw(void* h) { return (*static_cast<std::mt19937*>(h))(); }

}  // extern "C"
