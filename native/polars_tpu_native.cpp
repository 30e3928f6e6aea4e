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

}  // extern "C"
