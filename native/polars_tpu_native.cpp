// polars_tpu native runtime: host buffer pool with spill-to-disk + fast
// host-side kernels.
//
// The C++ counterpart of the reference's runtime crates:
//   - polars-ooc (spill manager, memory budget, pinned frames)
//   - polars-buffer (refcounted host buffers)
//   - polars-row (order-preserving row encoding; host fallback encoder)
//   - polars-compute's dictionary interning (binview_index_map.rs)
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// buffer pool with spill-to-disk (polars-ooc analogue)
// ---------------------------------------------------------------------------

struct Buf {
  uint8_t* data = nullptr;
  int64_t size = 0;
  bool spilled = false;
  std::string path;
};

static std::mutex g_mu;
static std::map<int64_t, Buf> g_bufs;
static int64_t g_next_id = 1;
static int64_t g_in_mem = 0;
static int64_t g_budget = 1LL << 34;  // 16 GiB default host budget
static int64_t g_spilled_bytes = 0;
static std::string g_spill_dir = "/tmp/polars_tpu_spill";

void pool_set_budget(int64_t bytes) { g_budget = bytes; }
void pool_set_spill_dir(const char* dir) { g_spill_dir = dir; }
int64_t pool_in_memory_bytes() { return g_in_mem; }
int64_t pool_spilled_bytes() { return g_spilled_bytes; }

static void spill_locked(int64_t id, Buf& b) {
  if (b.spilled || b.data == nullptr) return;
  char path[512];
  snprintf(path, sizeof(path), "%s/buf_%lld.bin", g_spill_dir.c_str(),
           (long long)id);
  FILE* f = fopen(path, "wb");
  if (!f) return;
  fwrite(b.data, 1, (size_t)b.size, f);
  fclose(f);
  free(b.data);
  b.data = nullptr;
  b.spilled = true;
  b.path = path;
  g_in_mem -= b.size;
  g_spilled_bytes += b.size;
}

// allocate a pooled buffer; spills least-recently-allocated buffers when the
// budget is exceeded (LeastRecent policy, polars-ooc/src/lib.rs)
int64_t pool_alloc(int64_t size) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (g_in_mem + size > g_budget) {
    for (auto& kv : g_bufs) {
      if (g_in_mem + size <= g_budget) break;
      spill_locked(kv.first, kv.second);
    }
  }
  Buf b;
  b.data = (uint8_t*)malloc((size_t)size);
  if (!b.data) return -1;
  b.size = size;
  int64_t id = g_next_id++;
  g_in_mem += size;
  g_bufs[id] = b;
  return id;
}

uint8_t* pool_ptr(int64_t id) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_bufs.find(id);
  if (it == g_bufs.end()) return nullptr;
  Buf& b = it->second;
  if (b.spilled) {  // reload (pin) — PinnedFrame analogue
    b.data = (uint8_t*)malloc((size_t)b.size);
    FILE* f = fopen(b.path.c_str(), "rb");
    if (!f) return nullptr;
    size_t rd = fread(b.data, 1, (size_t)b.size, f);
    fclose(f);
    (void)rd;
    remove(b.path.c_str());
    b.spilled = false;
    g_in_mem += b.size;
    g_spilled_bytes -= b.size;
  }
  return b.data;
}

void pool_free(int64_t id) {
  std::lock_guard<std::mutex> lk(g_mu);
  auto it = g_bufs.find(id);
  if (it == g_bufs.end()) return;
  if (it->second.spilled) {
    remove(it->second.path.c_str());
    g_spilled_bytes -= it->second.size;
  } else if (it->second.data) {
    free(it->second.data);
    g_in_mem -= it->second.size;
  }
  g_bufs.erase(it);
}

void pool_spill_all() {
  std::lock_guard<std::mutex> lk(g_mu);
  for (auto& kv : g_bufs) spill_locked(kv.first, kv.second);
}

// ---------------------------------------------------------------------------
// dictionary interning over Arrow string layout (offsets + bytes)
// (binview_index_map / categorical registry analogue)
// ---------------------------------------------------------------------------

// Encodes n strings (arrow offsets/data) to int32 codes against a growing
// dictionary. Returns the number of unique values. unique_offsets must hold
// n+1 entries; unique_data must hold total data size (worst case).
int64_t dict_encode_utf8(const int64_t* offsets, const uint8_t* data, int64_t n,
                         int32_t* out_codes, int64_t* unique_offsets,
                         uint8_t* unique_data) {
  std::unordered_map<std::string, int32_t> lut;
  lut.reserve((size_t)n * 2);
  int64_t upos = 0;
  int32_t next = 0;
  unique_offsets[0] = 0;
  for (int64_t i = 0; i < n; i++) {
    const char* s = (const char*)(data + offsets[i]);
    size_t len = (size_t)(offsets[i + 1] - offsets[i]);
    std::string key(s, len);
    auto it = lut.find(key);
    if (it == lut.end()) {
      lut.emplace(std::move(key), next);
      memcpy(unique_data + upos, s, len);
      upos += (int64_t)len;
      unique_offsets[next + 1] = upos;
      out_codes[i] = next++;
    } else {
      out_codes[i] = it->second;
    }
  }
  return next;
}

// ---------------------------------------------------------------------------
// order-preserving row encoding (polars-row/src/encode.rs analogue)
// ---------------------------------------------------------------------------

// Encode one int64 key column into big-endian order-preserving bytes with a
// null sentinel byte, appended at stride intervals into `rows`.
void rowenc_i64(const int64_t* vals, const uint8_t* validity, int64_t n,
                uint8_t* rows, int64_t stride, int64_t offset,
                int nulls_last) {
  for (int64_t i = 0; i < n; i++) {
    uint8_t* dst = rows + i * stride + offset;
    bool valid = validity == nullptr || validity[i];
    if (!valid) {
      dst[0] = nulls_last ? 0xFF : 0x00;
      memset(dst + 1, 0, 8);
      continue;
    }
    dst[0] = nulls_last ? 0x01 : 0x01;
    uint64_t u = (uint64_t)vals[i] ^ 0x8000000000000000ULL;  // sign flip
    for (int b = 0; b < 8; b++) dst[1 + b] = (uint8_t)(u >> (56 - 8 * b));
  }
}

void rowenc_f64(const double* vals, const uint8_t* validity, int64_t n,
                uint8_t* rows, int64_t stride, int64_t offset,
                int nulls_last) {
  for (int64_t i = 0; i < n; i++) {
    uint8_t* dst = rows + i * stride + offset;
    bool valid = validity == nullptr || validity[i];
    if (!valid) {
      dst[0] = nulls_last ? 0xFF : 0x00;
      memset(dst + 1, 0, 8);
      continue;
    }
    dst[0] = 0x01;
    uint64_t u;
    memcpy(&u, &vals[i], 8);
    // IEEE total order transform
    if (u >> 63)
      u = ~u;
    else
      u |= 0x8000000000000000ULL;
    for (int b = 0; b < 8; b++) dst[1 + b] = (uint8_t)(u >> (56 - 8 * b));
  }
}

// argsort of encoded rows via std::sort on row pointers (multi-key host sort)
void rowsort(const uint8_t* rows, int64_t stride, int64_t n, int64_t* out_idx) {
  std::vector<int64_t> idx((size_t)n);
  for (int64_t i = 0; i < n; i++) idx[(size_t)i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    return memcmp(rows + a * stride, rows + b * stride, (size_t)stride) < 0;
  });
  memcpy(out_idx, idx.data(), (size_t)n * sizeof(int64_t));
}

}  // extern "C"
