// Host-side replay spill store.
//
// TPU-native counterpart of the reference's disk-facing replay plumbing
// (/root/reference/csrc/liars_dice/rela/prioritized_replay.h:319-354 and
// rela/types.cc:87-111): the *device* ring in rebel_tpu.selfplay.replay
// holds the working set; this C++ store is the unbounded host-side
// archive used for dataset dumps, preloads and cross-run migration.  It
// is thread-safe (mutex-guarded append from a background drain thread)
// and reads/writes the reference's exact binary format
// ``[int32 qsize][int32 vsize][qsize f32][vsize f32]`` per row.
//
// Exposed as a C API consumed from Python via ctypes
// (rebel_tpu/selfplay/host_store.py).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Store {
  int qsize = 0;
  int vsize = 0;
  std::vector<float> queries;  // row-major [n, qsize]
  std::vector<float> values;   // row-major [n, vsize]
  std::mutex mu;

  int64_t rows() const { return vsize ? (int64_t)values.size() / vsize : 0; }
};

}  // namespace

extern "C" {

void* replay_store_create(int qsize, int vsize) {
  auto* s = new Store();
  s->qsize = qsize;
  s->vsize = vsize;
  return s;
}

void replay_store_destroy(void* handle) { delete static_cast<Store*>(handle); }

int64_t replay_store_size(void* handle) {
  auto* s = static_cast<Store*>(handle);
  std::lock_guard<std::mutex> lk(s->mu);
  return s->rows();
}

// Append n rows; q is [n, qsize] floats, v is [n, vsize].
void replay_store_append(void* handle, const float* q, const float* v,
                         int64_t n) {
  auto* s = static_cast<Store*>(handle);
  std::lock_guard<std::mutex> lk(s->mu);
  s->queries.insert(s->queries.end(), q, q + n * s->qsize);
  s->values.insert(s->values.end(), v, v + n * s->vsize);
}

// Copy rows [start, start+n) into out buffers.  Returns rows copied.
int64_t replay_store_read(void* handle, int64_t start, int64_t n, float* q_out,
                          float* v_out) {
  auto* s = static_cast<Store*>(handle);
  std::lock_guard<std::mutex> lk(s->mu);
  const int64_t total = s->rows();
  if (start >= total) return 0;
  n = std::min(n, total - start);
  std::memcpy(q_out, s->queries.data() + start * s->qsize,
              sizeof(float) * n * s->qsize);
  std::memcpy(v_out, s->values.data() + start * s->vsize,
              sizeof(float) * n * s->vsize);
  return n;
}

// Write every stride-th row to the reference binary format.  Returns rows
// written, or -1 on IO error.
int64_t replay_store_save(void* handle, const char* path, int64_t stride) {
  auto* s = static_cast<Store*>(handle);
  std::lock_guard<std::mutex> lk(s->mu);
  if (stride <= 0) stride = 1;  // stride 0 would loop forever
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int64_t written = 0;
  const int64_t total = s->rows();
  for (int64_t i = 0; i < total; i += stride) {
    fwrite(&s->qsize, sizeof(int), 1, f);
    fwrite(&s->vsize, sizeof(int), 1, f);
    fwrite(s->queries.data() + i * s->qsize, sizeof(float), s->qsize, f);
    fwrite(s->values.data() + i * s->vsize, sizeof(float), s->vsize, f);
    ++written;
  }
  fclose(f);
  return written;
}

// Load rows from the reference binary format (appending).  Returns rows
// loaded, or -1 on IO/format error.
int64_t replay_store_load(void* handle, const char* path, int64_t max_rows,
                          int64_t stride) {
  auto* s = static_cast<Store*>(handle);
  std::lock_guard<std::mutex> lk(s->mu);
  if (stride <= 0) stride = 1;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t loaded = 0, seen = 0;
  std::vector<float> qbuf, vbuf;
  while (true) {
    int qsize, vsize;
    if (fread(&qsize, sizeof(int), 1, f) != 1) break;
    if (fread(&vsize, sizeof(int), 1, f) != 1) break;
    if (qsize != s->qsize || vsize != s->vsize) {
      fclose(f);
      return -1;
    }
    qbuf.resize(qsize);
    vbuf.resize(vsize);
    if (fread(qbuf.data(), sizeof(float), qsize, f) != (size_t)qsize) break;
    if (fread(vbuf.data(), sizeof(float), vsize, f) != (size_t)vsize) break;
    if (seen % stride == 0) {
      s->queries.insert(s->queries.end(), qbuf.begin(), qbuf.end());
      s->values.insert(s->values.end(), vbuf.begin(), vbuf.end());
      ++loaded;
      if (max_rows > 0 && loaded >= max_rows) break;
    }
    ++seen;
  }
  fclose(f);
  return loaded;
}

}  // extern "C"
