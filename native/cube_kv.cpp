// Cube KV: the remote-embedding store of the serving path.
//
// Parity target: reference tools/inference/cpp (cube_api.h + the brpc
// cube protocol, ~9k LoC incl. generated protobuf): at serving time,
// large sparse tables are NOT in the model artifact — keys are looked up
// in an external KV store.  The TPU-era equivalent is a flat mmap-able
// binary shard: sorted keys + dense values, binary-search lookup; shards
// by key % num_shards like cube's partitioning.
//
// File layout (little endian):
//   magic  u64 = 0x4355424531313131 ("CUBE1111")
//   dim    u64
//   count  u64
//   keys   i64[count]   (sorted ascending)
//   values f32[count*dim]
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -o libcubekv.so cube_kv.cpp
//
// C API:
//   int  cube_build(const char* path, const long long* keys,
//                   const float* values, long count, long dim);
//   void* cube_open(const char* path);               // returns handle
//   long cube_dim(void* h); long cube_count(void* h);
//   long cube_lookup(void* h, const long long* keys, long n, float* out,
//                    const float* default_value);    // returns #hits
//   void cube_close(void* h);

#include <sys/mman.h>
#include <sys/stat.h>

#include <algorithm>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <unistd.h>
#include <vector>

namespace {
constexpr unsigned long long kMagic = 0x4355424531313131ULL;

struct Header {
  unsigned long long magic;
  unsigned long long dim;
  unsigned long long count;
};

struct Cube {
  void* map = nullptr;
  size_t size = 0;
  const Header* header = nullptr;
  const long long* keys = nullptr;
  const float* values = nullptr;
};
}  // namespace

extern "C" int cube_build(const char* path, const long long* keys,
                          const float* values, long count, long dim) {
  // keys must be written sorted; sort an index permutation
  std::vector<long> order(count);
  for (long i = 0; i < count; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](long a, long b) { return keys[a] < keys[b]; });
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  Header h{kMagic, (unsigned long long)dim, (unsigned long long)count};
  // every fwrite checked: a full disk must fail the BUILD, not SIGBUS
  // the serving fleet later
  if (fwrite(&h, sizeof(h), 1, f) != 1) { fclose(f); return -2; }
  for (long i = 0; i < count; ++i) {
    if (fwrite(&keys[order[i]], sizeof(long long), 1, f) != 1) {
      fclose(f);
      return -2;
    }
  }
  for (long i = 0; i < count; ++i) {
    if (fwrite(values + order[i] * dim, sizeof(float), dim, f)
        != (size_t)dim) {
      fclose(f);
      return -2;
    }
  }
  if (fclose(f) != 0) return -2;
  return 0;
}

extern "C" void* cube_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return nullptr;
  if ((size_t)st.st_size < sizeof(Header)) {
    munmap(map, st.st_size);
    return nullptr;
  }
  auto* header = (const Header*)map;
  // a truncated shard must fail at OPEN, not SIGBUS on first lookup
  size_t need = sizeof(Header)
      + header->count * sizeof(long long)
      + header->count * header->dim * sizeof(float);
  if (header->magic != kMagic || (size_t)st.st_size < need) {
    munmap(map, st.st_size);
    return nullptr;
  }
  auto* c = new Cube;
  c->map = map;
  c->size = st.st_size;
  c->header = header;
  c->keys = (const long long*)((const char*)map + sizeof(Header));
  c->values = (const float*)(c->keys + header->count);
  return c;
}

extern "C" long cube_dim(void* h) {
  return h ? (long)((Cube*)h)->header->dim : -1;
}

extern "C" long cube_count(void* h) {
  return h ? (long)((Cube*)h)->header->count : -1;
}

extern "C" long cube_lookup(void* h, const long long* query, long n,
                            float* out, const float* default_value) {
  if (!h) return -1;
  auto* c = (Cube*)h;
  const long long* keys = c->keys;
  long count = (long)c->header->count;
  long dim = (long)c->header->dim;
  long hits = 0;
  for (long i = 0; i < n; ++i) {
    const long long* it = std::lower_bound(keys, keys + count, query[i]);
    if (it != keys + count && *it == query[i]) {
      memcpy(out + i * dim, c->values + (it - keys) * dim,
             dim * sizeof(float));
      ++hits;
    } else if (default_value) {
      memcpy(out + i * dim, default_value, dim * sizeof(float));
    } else {
      memset(out + i * dim, 0, dim * sizeof(float));
    }
  }
  return hits;
}

extern "C" void cube_close(void* h) {
  if (!h) return;
  auto* c = (Cube*)h;
  munmap(c->map, c->size);
  delete c;
}
