// ThreadSanitizer stress driver for the host replay store.
//
// The reference ships no sanitizers (SURVEY §5: thread-safety by design
// comments only, rela/prioritized_replay.h:98-100).  This driver hammers
// the one genuinely concurrent host component — producers appending while
// a consumer reads and sizes — under -fsanitize=thread; any data race
// aborts with a TSAN report.  Built and run by
// tests/test_host_store.py::test_store_tsan_concurrent.

#include <cstdint>
#include <cstdio>
#include <thread>
#include <vector>

extern "C" {
void* replay_store_create(int qsize, int vsize);
void replay_store_destroy(void* handle);
int64_t replay_store_size(void* handle);
void replay_store_append(void* handle, const float* q, const float* v,
                         int64_t n);
int64_t replay_store_read(void* handle, int64_t start, int64_t n,
                          float* q_out, float* v_out);
}

int main() {
  constexpr int kQ = 6, kV = 4, kRowsPerPush = 32, kPushes = 200;
  void* store = replay_store_create(kQ, kV);

  auto producer = [&](int seed) {
    std::vector<float> q(kRowsPerPush * kQ), v(kRowsPerPush * kV);
    for (int i = 0; i < kPushes; ++i) {
      for (size_t j = 0; j < q.size(); ++j) q[j] = (float)(seed + i + j);
      for (size_t j = 0; j < v.size(); ++j) v[j] = (float)(seed - i - j);
      replay_store_append(store, q.data(), v.data(), kRowsPerPush);
    }
  };
  auto consumer = [&] {
    std::vector<float> q(kRowsPerPush * kQ), v(kRowsPerPush * kV);
    for (int i = 0; i < kPushes; ++i) {
      int64_t n = replay_store_size(store);
      if (n >= kRowsPerPush)
        replay_store_read(store, n - kRowsPerPush, kRowsPerPush, q.data(),
                          v.data());
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < 4; ++t) threads.emplace_back(producer, 1000 * t);
  threads.emplace_back(consumer);
  threads.emplace_back(consumer);
  for (auto& t : threads) t.join();

  int64_t total = replay_store_size(store);
  replay_store_destroy(store);
  if (total != 4 * kPushes * kRowsPerPush) {
    std::fprintf(stderr, "row count mismatch: %lld\n", (long long)total);
    return 1;
  }
  std::puts("tsan stress ok");
  return 0;
}
