// Graph store + walk/sample engine: the PGLBox graph-engine analog.
//
// Parity target: the reference's GPU graph learning drives an
// engine-side C++ graph service (paddle GraphGpuWrapper, configured by
// tools/utils/static_ps/graph.py:26-383 with sharded edge/node file
// loading, metapath random walks and fixed-fanout neighbor sampling,
// consumed chunk-by-chunk by tools/utils/static_ps/dataset.py:32-486).
// The TPU-era equivalent is a host-side C++ engine: the chip only ever
// sees fixed-shape (pair, neighbor) batches, so the graph machinery
// (CSR store, walker, sampler) lives here, multithreaded, behind a
// ctypes C API.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread -o libgraph.so graph_engine.cpp
//
// Edge files: text lines "src dst [weight]" (ids are dense-ish int64;
// storage is CSR over [0, max_id]).  symmetry=1 adds reverse edges
// (graph.py symmetry config).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Graph {
  std::vector<int64_t> offsets;  // max_id + 2
  std::vector<int64_t> edges;
  int64_t max_id = -1;
  int64_t num_nodes = 0;  // nodes with degree > 0
};

inline uint64_t splitmix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

struct EdgeChunk {
  std::vector<int64_t> src, dst;
  int64_t max_id = -1;
};

void parse_shard(const char* begin, const char* end, int symmetry,
                 EdgeChunk* out) {
  const char* p = begin;
  while (p < end) {
    const char* nl = (const char*)memchr(p, '\n', end - p);
    const char* line_end = nl ? nl : end;
    char* q;
    long long a = strtoll(p, &q, 10);
    if (q != p && q < line_end) {
      long long b = strtoll(q, &q, 10);
      if (a >= 0 && b >= 0 && q <= line_end) {
        out->src.push_back(a);
        out->dst.push_back(b);
        if (symmetry) {
          out->src.push_back(b);
          out->dst.push_back(a);
        }
        if (a > out->max_id) out->max_id = a;
        if (b > out->max_id) out->max_id = b;
      }
    }
    if (!nl) break;
    p = nl + 1;
  }
}

}  // namespace

extern "C" {

void* gr_create() { return new Graph(); }

void gr_free(void* h) { delete static_cast<Graph*>(h); }

// Load edge files into the CSR (multithreaded parse per file; files can
// arrive in several calls — the num_parts sharded-load contract — but
// the CSR is (re)built over everything seen so far on each call).
long gr_load(void* h, const char** files, int nfiles, int symmetry,
             int nthreads) {
  Graph* g = static_cast<Graph*>(h);
  if (nthreads < 1) nthreads = 1;
  // persistent raw edge buffer across calls lives in the Graph as the
  // CSR itself: rebuild by merging old CSR edges + new files
  std::vector<EdgeChunk> chunks;
  for (int f = 0; f < nfiles; ++f) {
    FILE* fp = fopen(files[f], "rb");
    if (!fp) return -1;
    fseek(fp, 0, SEEK_END);
    long len = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    std::vector<char> buf(len + 1);
    if (len > 0 && fread(buf.data(), 1, len, fp) != (size_t)len) {
      fclose(fp);
      return -2;
    }
    buf[len] = 0;
    fclose(fp);
    int nt = nthreads;
    std::vector<EdgeChunk> local(nt);
    std::vector<std::thread> threads;
    long chunk = len / nt;
    const char* cur = buf.data();
    const char* end = buf.data() + len;
    for (int t = 0; t < nt; ++t) {
      const char* stop = (t == nt - 1) ? end : buf.data() + chunk * (t + 1);
      if (stop < cur) stop = cur;
      while (stop < end && *stop != '\n') ++stop;
      threads.emplace_back(parse_shard, cur, stop, symmetry, &local[t]);
      cur = stop < end ? stop + 1 : end;
    }
    for (auto& th : threads) th.join();
    for (auto& c : local) chunks.push_back(std::move(c));
  }
  int64_t max_id = g->max_id;
  int64_t n_new = 0;
  for (auto& c : chunks) {
    if (c.max_id > max_id) max_id = c.max_id;
    n_new += (int64_t)c.src.size();
  }
  if (max_id < 0) return 0;
  // counting pass (old degrees + new)
  std::vector<int64_t> deg(max_id + 1, 0);
  if (g->max_id >= 0) {
    for (int64_t v = 0; v <= g->max_id; ++v)
      deg[v] = g->offsets[v + 1] - g->offsets[v];
  }
  for (auto& c : chunks)
    for (auto s : c.src) ++deg[s];
  std::vector<int64_t> offsets(max_id + 2, 0);
  for (int64_t v = 0; v <= max_id; ++v) offsets[v + 1] = offsets[v] + deg[v];
  std::vector<int64_t> edges(offsets[max_id + 1]);
  std::vector<int64_t> cursor(offsets.begin(), offsets.end() - 1);
  if (g->max_id >= 0) {
    for (int64_t v = 0; v <= g->max_id; ++v) {
      int64_t b = g->offsets[v], e = g->offsets[v + 1];
      for (int64_t i = b; i < e; ++i) edges[cursor[v]++] = g->edges[i];
    }
  }
  for (auto& c : chunks)
    for (size_t i = 0; i < c.src.size(); ++i)
      edges[cursor[c.src[i]]++] = c.dst[i];
  g->offsets = std::move(offsets);
  g->edges = std::move(edges);
  g->max_id = max_id;
  g->num_nodes = 0;
  for (int64_t v = 0; v <= max_id; ++v)
    if (g->offsets[v + 1] > g->offsets[v]) ++g->num_nodes;
  return n_new;
}

long gr_num_nodes(void* h) { return static_cast<Graph*>(h)->num_nodes; }
long gr_max_node(void* h) { return static_cast<Graph*>(h)->max_id; }
long gr_num_edges(void* h) {
  return (long)static_cast<Graph*>(h)->edges.size();
}

long gr_degree(void* h, long long node) {
  Graph* g = static_cast<Graph*>(h);
  if (node < 0 || node > g->max_id) return 0;
  return (long)(g->offsets[node + 1] - g->offsets[node]);
}

// all node ids with degree > 0, up to cap; returns count written
long gr_nodes(void* h, long long* out, long cap) {
  Graph* g = static_cast<Graph*>(h);
  long n = 0;
  for (int64_t v = 0; v <= g->max_id && n < cap; ++v)
    if (g->offsets[v + 1] > g->offsets[v]) out[n++] = v;
  return n;
}

// random walks: out (n, walk_len); rows pad with -1 once stuck
void gr_walks(void* h, const long long* starts, long n, int walk_len,
              unsigned long long seed, long long* out) {
  Graph* g = static_cast<Graph*>(h);
  int nt = (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;
  std::atomic<long> next(0);
  auto work = [&]() {
    for (;;) {
      long i = next.fetch_add(256);
      if (i >= n) break;
      long stop = i + 256 < n ? i + 256 : n;
      for (; i < stop; ++i) {
        long long cur = starts[i];
        uint64_t rs = splitmix64(seed * 0x9E3779B97F4A7C15ULL + i);
        for (int s = 0; s < walk_len; ++s) {
          out[i * walk_len + s] = cur;
          if (cur < 0) continue;
          if (s + 1 < walk_len) {
            int64_t b = (cur <= g->max_id) ? g->offsets[cur] : 0;
            int64_t e = (cur <= g->max_id) ? g->offsets[cur + 1] : 0;
            if (e <= b) {
              cur = -1;
            } else {
              rs = splitmix64(rs);
              cur = g->edges[b + (int64_t)(rs % (uint64_t)(e - b))];
            }
          }
        }
        if (starts[i] < 0)
          for (int s = 0; s < walk_len; ++s) out[i * walk_len + s] = -1;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& th : threads) th.join();
}

// fixed-fanout neighbor sampling: out (n, k) ids, mask (n, k) 1/0
void gr_sample(void* h, const long long* nodes, long n, int k,
               unsigned long long seed, long long* out, float* mask) {
  Graph* g = static_cast<Graph*>(h);
  int nt = (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > 16) nt = 16;
  std::atomic<long> next(0);
  auto work = [&]() {
    for (;;) {
      long i = next.fetch_add(512);
      if (i >= n) break;
      long stop = i + 512 < n ? i + 512 : n;
      for (; i < stop; ++i) {
        long long v = nodes[i];
        int64_t b = (v >= 0 && v <= g->max_id) ? g->offsets[v] : 0;
        int64_t e = (v >= 0 && v <= g->max_id) ? g->offsets[v + 1] : 0;
        uint64_t rs = splitmix64(seed * 0xBF58476D1CE4E5B9ULL + i);
        for (int j = 0; j < k; ++j) {
          if (e <= b) {
            out[i * k + j] = 0;
            mask[i * k + j] = 0.0f;
          } else {
            rs = splitmix64(rs);
            out[i * k + j] = g->edges[b + (int64_t)(rs % (uint64_t)(e - b))];
            mask[i * k + j] = 1.0f;
          }
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& th : threads) th.join();
}

}  // extern "C"
