"""Chunked graph-walk dataset: memory-capped passes over the native
graph engine.

Parity target: PGLBox's chunked dataset
(tools/utils/static_ps/dataset.py:32-486) — walks are generated
pass-by-pass with a bounded chunk of start nodes (pass size capped by
device/host memory), and the NEXT pass is produced by a preload thread
while the current one trains (dataset.py:55-70,220-313 semaphore
pattern).  The walker/sampler is the native CSR engine
(native/graph_engine.cpp); a pure-Python fallback keeps toolchain-less
environments working.
"""

from __future__ import annotations

import queue
import threading
from typing import Optional, Sequence

import numpy as np


def window_pairs(walks: np.ndarray, win: int) -> np.ndarray:
    """(C, L) walks with -1 padding → (N, 2) (center, context) pairs for
    every |i-j| <= win, j != i (both directions, like the reference's
    skip-gram pair generation)."""
    outs = []
    for off in range(1, win + 1):
        if walks.shape[1] <= off:
            break
        a = walks[:, :-off]
        b = walks[:, off:]
        valid = (a >= 0) & (b >= 0)
        av, bv = a[valid], b[valid]
        outs.append(np.stack([av, bv], 1))
        outs.append(np.stack([bv, av], 1))
    if not outs:
        return np.zeros((0, 2), np.int64)
    return np.concatenate(outs, 0)


class GraphChunkedDataset:
    """Edge files → native engine → chunked walk passes → model batches.

    chunk_nodes caps the start nodes per pass: peak host memory is
    O(chunk_nodes · walk_len · win) pairs instead of O(nodes · walks),
    so graphs far larger than one pass chunk train fine (the
    deepwalk_million contract).
    """

    def __init__(self, files: Sequence[str], md, batch_size: int,
                 seed: int = 2023, chunk_nodes: Optional[int] = None,
                 num_parts: int = 4, preload: bool = True):
        from paddlerec_tpu.native.graph import GraphEngine

        self.md = md
        self.batch_size = int(batch_size)
        self.seed = seed
        self.chunk_nodes = int(
            chunk_nodes
            or int(md.config.hyper("graph_chunk_nodes", 8192))
        )
        self.preload = preload
        self.engine = GraphEngine(symmetry=True)
        files = list(files)
        # sharded load (graph_sharding.py num_parts contract): bounded
        # parse buffers per part
        parts = max(1, min(num_parts, len(files)))
        for p in range(parts):
            shard = files[p::parts]
            if shard:
                self.engine.load(shard)
        self._nodes = self.engine.nodes()
        self._epoch = 0

    # -- pass generation -------------------------------------------------------
    def _passes(self, rng: np.random.RandomState):
        md = self.md
        nodes = self._nodes.copy()
        for _ in range(md.walk_times):
            rng.shuffle(nodes)
            for c0 in range(0, len(nodes), self.chunk_nodes):
                chunk = nodes[c0 : c0 + self.chunk_nodes]
                walks = self.engine.walks(
                    chunk, md.walk_len, seed=rng.randint(2**31)
                )
                pairs = window_pairs(walks, md.win_size)
                if len(pairs):
                    rng.shuffle(pairs)
                yield pairs

    def _batches_of(self, pairs: np.ndarray, rem: Optional[np.ndarray],
                    rng: np.random.RandomState):
        if rem is not None and len(rem):
            pairs = np.concatenate([rem, pairs], 0)
        bs = self.batch_size
        stop = len(pairs) - (len(pairs) % bs)
        for i in range(0, stop, bs):
            yield self._batch(pairs[i : i + bs], rng)
        yield None, pairs[stop:]  # sentinel carrying the remainder

    def _batch(self, pairs: np.ndarray, rng: np.random.RandomState):
        md = self.md
        out = {"pair_nodes": pairs}
        prev = pairs
        for i, fanout in enumerate(md.samples):
            nb, mask = self.engine.sample(
                prev, fanout, seed=rng.randint(2**31)
            )
            out[f"neigh_{i}"] = nb
            out[f"neigh_mask_{i}"] = mask
            prev = nb
        return out, None

    def __iter__(self):
        # two INDEPENDENT streams: the producer thread (pass shuffles +
        # walk seeds) must never share a RandomState with the consumer
        # (_batch neighbor-sample seeds) — RandomState is not
        # thread-safe and shared access would break seed determinism
        prod_rng = np.random.RandomState(self.seed + self._epoch)
        rng = np.random.RandomState(self.seed + self._epoch + 10_000_019)
        self._epoch += 1
        pass_iter = self._passes(prod_rng)
        if self.preload:
            # one-pass-ahead preload thread (the reference's semaphore
            # preload, dataset.py:220-313)
            q: "queue.Queue" = queue.Queue(maxsize=1)
            DONE = object()

            def producer():
                try:
                    for p in pass_iter:
                        q.put(p)
                except BaseException as e:
                    q.put(e)
                q.put(DONE)

            threading.Thread(target=producer, daemon=True).start()

            def passes():
                while True:
                    item = q.get()
                    if item is DONE:
                        return
                    if isinstance(item, BaseException):
                        raise item
                    yield item

            source = passes()
        else:
            source = pass_iter
        rem: Optional[np.ndarray] = None
        for pairs in source:
            for item, tail in self._batches_of(pairs, rem, rng):
                if item is None:
                    rem = tail
                else:
                    yield item
