// Multithreaded slot-format text parser -> fixed numpy-ready buffers.
//
// The TPU-era replacement for the engine-side QueueDataset /
// InMemoryDataset C++ readers the reference drives through
// tools/utils/static_ps/reader_helper.py:240-312: N worker threads split
// a file's byte range on line boundaries and parse
//     click:L dense_feature:v ... 1:id 2:id ... S:id
// rows into (labels i64, sparse i64 [S], dense f32 [D]) arrays the
// Python side wraps zero-copy as one ready batch.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread -o libfastreader.so fast_reader.cpp
//
// C API (ctypes-friendly):
//   long frd_parse_file(const char* path, int num_sparse, int dense_dim,
//                       long max_rows, int num_threads,
//                       long long* labels, long long* sparse, float* dense);
//     returns #rows parsed (<0 on error).

#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Shard {
  const char* begin;
  const char* end;
  long rows = 0;            // rows parsed in this shard
  std::vector<long long> labels;
  std::vector<long long> sparse;
  std::vector<float> dense;
};

// parse one line in place; returns true if a valid row was produced
bool parse_line(const char* p, const char* end, int num_sparse, int dense_dim,
                long long* label, long long* sparse, float* dense) {
  *label = 0;
  for (int i = 0; i < num_sparse; ++i) sparse[i] = 0;
  for (int i = 0; i < dense_dim; ++i) dense[i] = 0.0f;
  int dense_seen = 0;
  bool any = false;
  while (p < end) {
    while (p < end && (*p == ' ' || *p == '\t')) ++p;
    if (p >= end) break;
    const char* tok = p;
    while (p < end && *p != ' ' && *p != '\t') ++p;
    const char* tok_end = p;
    const char* colon = (const char*)memchr(tok, ':', tok_end - tok);
    if (!colon) continue;
    size_t name_len = colon - tok;
    const char* val = colon + 1;
    if (name_len == 5 && memcmp(tok, "click", 5) == 0) {
      *label = strtoll(val, nullptr, 10);
      any = true;
    } else if (name_len == 13 && memcmp(tok, "dense_feature", 13) == 0) {
      if (dense_seen < dense_dim) dense[dense_seen++] = strtof(val, nullptr);
      any = true;
    } else {
      // numeric slot name 1..num_sparse
      char name_buf[16];
      if (name_len < sizeof(name_buf)) {
        memcpy(name_buf, tok, name_len);
        name_buf[name_len] = 0;
        char* e;
        long slot = strtol(name_buf, &e, 10);
        if (*e == 0 && slot >= 1 && slot <= num_sparse) {
          sparse[slot - 1] = strtoll(val, nullptr, 10);
          any = true;
        }
      }
    }
  }
  return any;
}

void worker(Shard* shard, int num_sparse, int dense_dim) {
  const char* p = shard->begin;
  std::vector<long long> srow(num_sparse);
  std::vector<float> drow(dense_dim);
  long long label;
  while (p < shard->end) {
    const char* nl = (const char*)memchr(p, '\n', shard->end - p);
    const char* line_end = nl ? nl : shard->end;
    if (parse_line(p, line_end, num_sparse, dense_dim, &label, srow.data(),
                   drow.data())) {
      shard->labels.push_back(label);
      shard->sparse.insert(shard->sparse.end(), srow.begin(), srow.end());
      shard->dense.insert(shard->dense.end(), drow.begin(), drow.end());
      ++shard->rows;
    }
    if (!nl) break;
    p = nl + 1;
  }
}

}  // namespace

extern "C" long frd_parse_buffer(const char* data, long len, int num_sparse,
                                 int dense_dim, long max_rows,
                                 int num_threads, long long* labels,
                                 long long* sparse, float* dense) {
  if (num_threads < 1) num_threads = 1;
  std::vector<Shard> shards(num_threads);
  // split on line boundaries
  long chunk = len / num_threads;
  const char* cur = data;
  const char* end = data + len;
  for (int t = 0; t < num_threads; ++t) {
    const char* stop = (t == num_threads - 1) ? end : data + chunk * (t + 1);
    if (stop < cur) stop = cur;
    // extend to the next newline
    while (stop < end && *stop != '\n') ++stop;
    shards[t].begin = cur;
    shards[t].end = stop;
    cur = stop < end ? stop + 1 : end;
  }
  std::vector<std::thread> threads;
  for (auto& s : shards)
    threads.emplace_back(worker, &s, num_sparse, dense_dim);
  for (auto& th : threads) th.join();

  long total = 0;
  for (auto& s : shards) {
    long take = s.rows;
    if (total + take > max_rows) take = max_rows - total;
    if (take <= 0) break;
    memcpy(labels + total, s.labels.data(), take * sizeof(long long));
    memcpy(sparse + total * num_sparse, s.sparse.data(),
           take * num_sparse * sizeof(long long));
    if (dense_dim > 0)
      memcpy(dense + total * dense_dim, s.dense.data(),
             take * dense_dim * sizeof(float));
    total += take;
  }
  return total;
}

extern "C" long frd_parse_file(const char* path, int num_sparse,
                               int dense_dim, long max_rows, int num_threads,
                               long long* labels, long long* sparse,
                               float* dense) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  // +1 NUL terminator: strtoll/strtof scan past the last byte when the
  // final token ends exactly at EOF (files without a trailing newline
  // are explicitly supported) — unterminated buffers are UB
  std::vector<char> buf(len + 1);
  if (len > 0 && fread(buf.data(), 1, len, f) != (size_t)len) {
    fclose(f);
    return -2;
  }
  buf[len] = '\0';
  fclose(f);
  return frd_parse_buffer(buf.data(), len, num_sparse, dense_dim, max_rows,
                          num_threads, labels, sparse, dense);
}

extern "C" long frd_count_lines(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char buf[1 << 16];
  long n = 0;
  size_t got;
  while ((got = fread(buf, 1, sizeof(buf), f)) > 0)
    for (size_t i = 0; i < got; ++i)
      if (buf[i] == '\n') ++n;
  fclose(f);
  return n;
}
