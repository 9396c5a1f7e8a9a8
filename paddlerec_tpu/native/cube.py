"""Cube KV store: export sharded embedding tables for the serving fleet.

Parity target: reference tools/inference/cpp + get_leaf_embedding-style
table dumps — large sparse tables leave the model artifact and are
looked up in a sharded KV store at serving time ("大规模稀疏参数…直接去
远端查询", tools/inference/cpp/README.md).  Shard s holds keys with
``key % num_shards == s`` (cube's partitioning); lookups hit the mmap'd
sorted arrays via binary search in C.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from paddlerec_tpu.native import cubekv


class CubeShardWriter:
    @staticmethod
    def build(path: str, keys: np.ndarray, values: np.ndarray) -> str:
        keys = np.ascontiguousarray(keys, np.int64)
        values = np.ascontiguousarray(values, np.float32)
        assert keys.ndim == 1 and values.ndim == 2
        assert len(keys) == len(values)
        lib = cubekv()
        rc = lib.cube_build(
            path.encode(),
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(keys), values.shape[1],
        )
        if rc != 0:
            raise IOError(f"cube_build failed: {rc}")
        return path


def export_table(
    out_dir: str, keys: np.ndarray, values: np.ndarray, num_shards: int = 1
) -> List[str]:
    """Split (keys, values) into ``num_shards`` cube files by key % shards."""
    os.makedirs(out_dir, exist_ok=True)
    keys = np.asarray(keys, np.int64)
    paths = []
    for s in range(num_shards):
        sel = (keys % num_shards) == s
        path = os.path.join(out_dir, f"cube_shard_{s}.bin")
        CubeShardWriter.build(path, keys[sel], values[sel])
        paths.append(path)
    return paths


class CubeClient:
    """Query a set of cube shards (the cube_api.h client analog)."""

    def __init__(self, shard_paths: List[str],
                 default_value: Optional[np.ndarray] = None):
        self._lib = cubekv()

        def shard_id(path):
            import re as _re

            m = _re.search(r"cube_shard_(\d+)\.bin$", path)
            if m is None:
                raise ValueError(
                    f"{path!r} is not a cube shard (expect cube_shard_<id>.bin)"
                )
            return int(m.group(1))

        if not shard_paths:
            raise ValueError(
                "no shard paths given — expected one or more "
                "cube_shard_<id>.bin files (check the export directory; "
                "export_table writes shards under <out_dir>/)"
            )
        # order by the shard id encoded in the filename — a lexicographic
        # sort misroutes key%shards lookups once num_shards >= 10
        ordered = sorted(shard_paths, key=shard_id)
        if [shard_id(p) for p in ordered] != list(range(len(ordered))):
            raise ValueError(f"shard set is not contiguous: {ordered}")
        self._handles = []
        for p in ordered:
            h = self._lib.cube_open(p.encode())
            if not h:
                raise IOError(f"cube_open failed for {p}")
            self._handles.append(h)
        self.num_shards = len(self._handles)
        self.dim = int(self._lib.cube_dim(self._handles[0]))
        self._default = (
            np.ascontiguousarray(default_value, np.float32)
            if default_value is not None else None
        )

    def seek(self, keys: np.ndarray) -> np.ndarray:
        """(N,) int64 keys → (N, dim) float32 values (zeros on miss)."""
        keys = np.ascontiguousarray(keys, np.int64).reshape(-1)
        out = np.zeros((len(keys), self.dim), np.float32)
        default_ptr = (
            self._default.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if self._default is not None
            else ctypes.POINTER(ctypes.c_float)()
        )
        if self.num_shards == 1:
            self._lib.cube_lookup(
                self._handles[0],
                keys.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                len(keys),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                default_ptr,
            )
            return out
        for s in range(self.num_shards):
            sel = np.nonzero(keys % self.num_shards == s)[0]
            if not len(sel):
                continue
            sub = np.ascontiguousarray(keys[sel])
            sub_out = np.zeros((len(sel), self.dim), np.float32)
            self._lib.cube_lookup(
                self._handles[s],
                sub.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                len(sel),
                sub_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                default_ptr,
            )
            out[sel] = sub_out
        return out

    def close(self):
        for h in self._handles:
            self._lib.cube_close(h)
        self._handles = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RemoteCubeClient:
    """Query a cube server FLEET over TCP (the cube_api.h remote client
    analog — reference predictors never hold the big tables locally,
    tools/inference/cpp/main.cpp).

    addrs: one "host:port" per shard id — server i must hold shard i
    (key % num_shards == i); a single entry means one server holds every
    shard (it routes per key).  The wire protocol is the binary framing
    documented in native/cube_server.cpp.
    """

    _REQ_MAGIC = 0x43554251
    _RESP_MAGIC = 0x43554252
    _ANY_SHARD = 0xFFFFFFFF

    def __init__(self, addrs: List[str], timeout: float = 10.0):
        import socket as _socket

        if not addrs:
            raise ValueError("need at least one cube server address")
        self.addrs = list(addrs)
        self._socks = []
        for a in self.addrs:
            host, _, port = a.rpartition(":")
            s = _socket.create_connection(
                (host or "127.0.0.1", int(port)), timeout=timeout
            )
            s.setsockopt(_socket.IPPROTO_TCP, _socket.TCP_NODELAY, 1)
            self._socks.append(s)
        self.dim = self._probe_dim()

    # pure framing functions: the wire GRAMMAR lives here so the
    # golden-bytes fixtures (tests/fixtures/cube_wire/) can pin it
    # byte-for-byte — the contract the Go/Java clients and the C++
    # server all implement
    @classmethod
    def encode_request(cls, shard_id: int, keys: np.ndarray) -> bytes:
        """u32 'QBUC' | u32 shard_id | u32 n | i64 keys[n] (all LE)."""
        import struct as _struct

        keys = np.ascontiguousarray(keys, "<i8")
        return (
            _struct.pack("<III", cls._REQ_MAGIC, shard_id, len(keys))
            + keys.tobytes()
        )

    @classmethod
    def decode_response_header(cls, header: bytes):
        """20-byte header → (status, dim, n, hits); raises on bad magic."""
        import struct as _struct

        magic, status, dim, n, hits = _struct.unpack("<IIIII", header)
        if magic != cls._RESP_MAGIC:
            raise IOError(f"bad cube response magic {magic:#x}")
        return status, dim, n, hits

    def _roundtrip(self, sock, shard_id: int, keys: np.ndarray) -> np.ndarray:
        sock.sendall(self.encode_request(shard_id, keys))
        header = self._read_exact(sock, 20)
        status, dim, n, _hits = self.decode_response_header(header)
        if status != 0:
            raise IOError(f"cube server error (status {status})")
        vals = self._read_exact(sock, n * dim * 4)
        return np.frombuffer(vals, "<f4").reshape(n, dim).copy()

    @staticmethod
    def _read_exact(sock, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            got = sock.recv(n - len(buf))
            if not got:
                raise IOError("cube server closed the connection")
            buf += got
        return buf

    def _probe_dim(self) -> int:
        out = self._roundtrip(self._socks[0], self._ANY_SHARD,
                              np.zeros(0, np.int64))
        return out.shape[1]

    def seek(self, keys: np.ndarray) -> np.ndarray:
        """(N,) int64 keys → (N, dim) float32 (zeros on miss), routed
        key%num_servers across the fleet."""
        keys = np.ascontiguousarray(keys, np.int64).reshape(-1)
        ns = len(self._socks)
        if ns == 1:
            return self._roundtrip(self._socks[0], self._ANY_SHARD, keys)
        out = np.zeros((len(keys), self.dim), np.float32)
        owner = keys % ns
        for s in range(ns):
            sel = np.nonzero(owner == s)[0]
            if not len(sel):
                continue
            out[sel] = self._roundtrip(self._socks[s], s, keys[sel])
        return out

    def close(self) -> None:
        for s in self._socks:
            try:
                s.close()
            except OSError:
                pass


def start_cube_server(port: int, shard_paths: List[str]):
    """Launch the cube_server daemon; returns the Popen (caller owns).

    Blocks until the readiness line is printed so tests/clients can
    connect immediately."""
    import subprocess

    from paddlerec_tpu.native import build_cube_server

    binary = build_cube_server()
    proc = subprocess.Popen(
        [binary, str(port), *shard_paths],
        stdout=subprocess.PIPE, text=True,
    )
    line = proc.stdout.readline()
    if "serving" not in line:
        proc.kill()
        raise RuntimeError(f"cube_server failed to start: {line!r}")
    return proc
