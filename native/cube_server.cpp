// Cube KV server: the networked embedding-serving daemon.
//
// Parity target: the reference cube is a REMOTE sharded KV fleet — many
// predictors query a set of cube servers for embedding vectors at
// serving time (tools/inference/cpp/main.cpp, include/cube_api.h:126,
// brpc transport + proto/cube.pb).  This daemon serves the same mmap
// sorted-KV shards that cube_kv.cpp builds (tools/export_cube.py /
// online delta publishing), so a 10^8-row table can live on separate
// boxes from the predictors.
//
// Wire protocol (little-endian, length-implicit binary — the brpc
// analog without the framework):
//   request : u32 magic 'QBUC' | u32 shard_id | u32 n | i64 keys[n]
//   response: u32 magic 'RBUC' | u32 status(0 ok) | u32 dim | u32 n |
//             u32 hits | f32 values[n*dim]
//   shard_id == 0xFFFFFFFF lets the server pick by key%num_shards per
//   key (single-server deployments holding every shard).
//
// Build: g++ -O3 -std=c++17 -pthread -o cube_server cube_server.cpp
//        (links the cube_kv.cpp mmap reader via #include)
// Run:   ./cube_server <port> <shard0.bin> [shard1.bin ...]
//
// One thread per connection; shards are mmap'd read-only so worker
// threads share pages with zero synchronization.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>

#include <csignal>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

// reuse the mmap shard reader (single translation unit keeps the build
// one command and the binary self-contained)
#include "cube_kv.cpp"

namespace {

constexpr uint32_t kReqMagic = 0x43554251;   // "QBUC" LE
constexpr uint32_t kRespMagic = 0x43554252;  // "RBUC" LE
constexpr uint32_t kAnyShard = 0xFFFFFFFFu;

struct Shard {
  void* handle = nullptr;
  long dim = 0;
};

// indexed by GLOBAL shard id (parsed from cube_shard_<id>.bin, the
// export_table naming contract) — a server holding only shard 3 still
// answers requests addressed to shard 3
std::vector<Shard> g_shards;
std::vector<void*> g_local;  // handles in launch order (any-shard route)

int shard_id_from_path(const char* path) {
  const char* base = strrchr(path, '/');
  base = base ? base + 1 : path;
  int id = -1;
  if (sscanf(base, "cube_shard_%d.bin", &id) == 1) return id;
  return -1;
}

bool read_exact(int fd, void* buf, size_t n) {
  char* p = static_cast<char*>(buf);
  while (n) {
    ssize_t got = recv(fd, p, n, 0);
    if (got <= 0) return false;
    p += got;
    n -= static_cast<size_t>(got);
  }
  return true;
}

bool write_exact(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n) {
    ssize_t put = send(fd, p, n, MSG_NOSIGNAL);
    if (put <= 0) return false;
    p += put;
    n -= static_cast<size_t>(put);
  }
  return true;
}

void serve_conn(int fd) {
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
  for (;;) {
    uint32_t header[3];
    if (!read_exact(fd, header, sizeof(header))) break;
    if (header[0] != kReqMagic) break;
    uint32_t shard_id = header[1];
    uint32_t n = header[2];
    if (n > (64u << 20)) break;  // sanity: 64M keys max per request
    std::vector<long long> keys(n);
    if (n && !read_exact(fd, keys.data(), n * sizeof(long long))) break;

    long dim = 0;
    for (auto& s : g_shards)
      if (s.handle) { dim = s.dim; break; }
    std::vector<float> out(static_cast<size_t>(n) * dim, 0.0f);
    uint32_t status = 0;
    long hits = 0;
    if (shard_id == kAnyShard) {
      // route per key: key % num_local_shards owns it (single-server
      // deployments launched with the full contiguous shard set)
      size_t ns = g_local.size();
      std::vector<std::vector<long long>> by_shard(ns);
      std::vector<std::vector<uint32_t>> pos(ns);
      for (uint32_t i = 0; i < n; ++i) {
        size_t s = static_cast<size_t>(
            ((keys[i] % static_cast<long long>(ns)) + ns) % ns);
        by_shard[s].push_back(keys[i]);
        pos[s].push_back(i);
      }
      for (size_t s = 0; s < ns; ++s) {
        if (by_shard[s].empty() || !g_local[s]) continue;
        std::vector<float> tmp(by_shard[s].size() * dim);
        hits += cube_lookup(g_local[s], by_shard[s].data(),
                            static_cast<long>(by_shard[s].size()),
                            tmp.data(), nullptr);
        for (size_t j = 0; j < by_shard[s].size(); ++j)
          memcpy(&out[static_cast<size_t>(pos[s][j]) * dim],
                 &tmp[j * dim], dim * sizeof(float));
      }
    } else if (shard_id < g_shards.size() && g_shards[shard_id].handle) {
      hits = cube_lookup(g_shards[shard_id].handle, keys.data(),
                         static_cast<long>(n), out.data(), nullptr);
    } else {
      status = 1;  // unknown shard
    }
    uint32_t resp[5] = {kRespMagic, status, static_cast<uint32_t>(dim), n,
                        static_cast<uint32_t>(hits)};
    if (!write_exact(fd, resp, sizeof(resp))) break;
    if (n && !write_exact(fd, out.data(), out.size() * sizeof(float)))
      break;
  }
  close(fd);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr,
            "usage: %s <port> [--bind ADDR] <shard0.bin> [shard1.bin ...]\n"
            "  default bind is 0.0.0.0 (the fleet is remote by design);\n"
            "  pass --bind 127.0.0.1 for loopback-only deployments\n",
            argv[0]);
    return 2;
  }
  signal(SIGPIPE, SIG_IGN);
  int port = atoi(argv[1]);
  // remote predictors are the POINT of the cube fleet (doc/serving.md
  // 'host0:9527' topology) — bind all interfaces unless told otherwise
  in_addr_t bind_addr = htonl(INADDR_ANY);
  int first_shard = 2;
  if (first_shard < argc && strcmp(argv[first_shard], "--bind") == 0) {
    if (first_shard + 1 >= argc) {
      fprintf(stderr, "cube_server: --bind needs an address\n");
      return 2;
    }
    if (inet_pton(AF_INET, argv[first_shard + 1], &bind_addr) != 1) {
      fprintf(stderr, "cube_server: bad --bind address %s\n",
              argv[first_shard + 1]);
      return 2;
    }
    first_shard += 2;
  }
  if (first_shard >= argc) {  // --bind consumed everything: no shards
    fprintf(stderr, "cube_server: at least one shard file is required\n");
    return 2;
  }
  long dim0 = -1;
  for (int i = first_shard; i < argc; ++i) {
    Shard s;
    s.handle = cube_open(argv[i]);
    if (!s.handle) {
      fprintf(stderr, "cube_server: cannot open shard %s\n", argv[i]);
      return 1;
    }
    s.dim = cube_dim(s.handle);
    if (dim0 >= 0 && s.dim != dim0) {
      fprintf(stderr, "cube_server: shard dim mismatch\n");
      return 1;
    }
    dim0 = s.dim;
    int gid = shard_id_from_path(argv[i]);
    if (gid < 0) gid = i - first_shard;  // fallback: positional
    if (static_cast<size_t>(gid) >= g_shards.size())
      g_shards.resize(gid + 1);
    g_shards[gid] = s;
    g_local.push_back(s.handle);
  }

  int srv = socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = bind_addr;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    perror("cube_server: bind");
    return 1;
  }
  if (listen(srv, 64) != 0) {
    perror("cube_server: listen");
    return 1;
  }
  // readiness marker for launchers polling stdout
  printf("cube_server: serving %zu shard(s) dim %ld on port %d\n",
         g_local.size(), dim0 < 0 ? 0 : dim0, port);
  fflush(stdout);
  for (;;) {
    int fd = accept(srv, nullptr, nullptr);
    if (fd < 0) continue;
    std::thread(serve_conn, fd).detach();
  }
}
