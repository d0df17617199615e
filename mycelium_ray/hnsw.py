"""From-scratch HNSW (Malkov & Yashunin 2016, IEEE TPAMI 2018) over
cosine similarity — the graph-based ANN path beside the LSH / IVF / PQ
family in pipelines/ann.py.

Faithful to the published algorithm: exponentially-distributed insert
levels (mL = 1/ln M), greedy single-entry descent through the upper
layers, ef-bounded best-first search (Algorithm 2) at the target layer,
bidirectional linking with degree pruning (Mmax = M above layer 0, 2M at
layer 0). Neighbor selection uses the simple closest-M rule (the paper's
Algorithm 3); vectors are L2-normalized once so similarity is a dot
product and "closest" = largest sim.

Determinism: insert levels come from the in-repo splitmix64 stream keyed
by the vector id — same data, same graph, byte-stable results (no
wall-clock randomness anywhere, per the repo's resume contract).

Scale story: one HNSW per hash partition (pipelines/ann.ann_topk_hnsw) —
builds are embarrassingly parallel across partitions, queries fan out
and merge through the shared partial-top-k path; a 10^10-row corpus is
more partitions, never a bigger single graph.
"""

from __future__ import annotations

import heapq
from math import log

import numpy as np

from .hashing import splitmix64


class HNSW:
    def __init__(self, dim: int, m: int = 16, ef_construction: int = 100):
        self.dim = dim
        self.m = m
        self.m0 = 2 * m
        self.efc = ef_construction
        self.ml = 1.0 / log(m)
        # capacity-doubling matrix of normalized rows: neighbor scoring
        # is a batched dot product, not per-node Python
        self._vm = np.empty((256, dim), dtype=np.float64)
        self._n = 0
        self.ids: list[int] = []
        # links[node] = list over levels 0..level(node) of neighbor lists
        self.links: list[list[list[int]]] = []
        self.entry = -1
        self.max_level = -1

    # -- internals --
    def _level_for(self, vid: int) -> int:
        u = (splitmix64(vid ^ 0x9E3779B97F4A7C15) >> 11) / float(1 << 53)
        u = max(u, 1e-12)
        return int(-log(u) * self.ml)

    @property
    def vecs(self) -> np.ndarray:
        return self._vm[:self._n]

    def _append_vec(self, v: np.ndarray) -> None:
        if self._n == len(self._vm):
            grown = np.empty((2 * len(self._vm), self.dim), np.float64)
            grown[:self._n] = self._vm[:self._n]
            self._vm = grown
        self._vm[self._n] = v
        self._n += 1

    def _sim(self, q: np.ndarray, node: int) -> float:
        return float(self._vm[node] @ q)

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      level: int) -> list[tuple[float, int]]:
        """Algorithm 2: best-first from ``eps``; returns up to ef
        (sim, node) pairs, best-first order not guaranteed."""
        visited = set(eps)
        # candidates: max-heap by sim (negated); results: min-heap by sim
        cand = [(-self._sim(q, e), e) for e in eps]
        heapq.heapify(cand)
        res = [(-negs, e) for negs, e in cand]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            cs, c = heapq.heappop(cand)
            if -cs < res[0][0] and len(res) >= ef:
                break
            fresh = [nb for nb in self.links[c][level]
                     if nb not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            sims = self._vm[fresh] @ q        # one batched dot product
            for s, nb in zip(sims.tolist(), fresh):
                if len(res) < ef or s > res[0][0]:
                    heapq.heappush(cand, (-s, nb))
                    heapq.heappush(res, (s, nb))
                    if len(res) > ef:
                        heapq.heappop(res)
        return res

    def _greedy(self, q: np.ndarray, ep: int, level: int) -> int:
        """Greedy descent within one layer (ef=1 fast path)."""
        cur = ep
        cur_s = self._sim(q, cur)
        improved = True
        while improved:
            improved = False
            nbs = self.links[cur][level]
            if not nbs:
                break
            sims = self._vm[nbs] @ q
            best = int(np.argmax(sims))
            if sims[best] > cur_s:
                cur, cur_s = nbs[best], float(sims[best])
                improved = True
        return cur

    # -- public --
    def add(self, vid: int, vec: np.ndarray) -> None:
        v = np.asarray(vec, dtype=np.float64)
        n = np.linalg.norm(v)
        v = v / n if n else v
        node = self._n
        level = self._level_for(vid)
        self._append_vec(v)
        self.ids.append(int(vid))
        self.links.append([[] for _ in range(level + 1)])
        if self.entry < 0:
            self.entry = node
            self.max_level = level
            return
        ep = self.entry
        for lc in range(self.max_level, level, -1):
            ep = self._greedy(v, ep, lc)
        for lc in range(min(level, self.max_level), -1, -1):
            w = self._search_layer(v, [ep], self.efc, lc)
            mmax = self.m0 if lc == 0 else self.m
            neigh = [nd for _s, nd in sorted(w, reverse=True)[:self.m]]
            for nb in neigh:
                self.links[node][lc].append(nb)
                self.links[nb][lc].append(node)
                if len(self.links[nb][lc]) > mmax:
                    # prune to the closest mmax (simple selection)
                    vl = self.links[nb][lc]
                    sims = self._vm[vl] @ self._vm[nb]
                    keep = np.argsort(-sims, kind="stable")[:mmax]
                    self.links[nb][lc] = [vl[i] for i in keep]
            ep = max(w)[1] if w else ep
        if level > self.max_level:
            self.entry = node
            self.max_level = level

    def search(self, q: np.ndarray, k: int, ef: int = 64) -> list[tuple]:
        """Top-k (sim, vec_id) by cosine, best first; deterministic
        tie-break on vec_id asc."""
        if self.entry < 0:
            return []
        qv = np.asarray(q, dtype=np.float64)
        n = np.linalg.norm(qv)
        qv = qv / n if n else qv
        ep = self.entry
        for lc in range(self.max_level, 0, -1):
            ep = self._greedy(qv, ep, lc)
        res = self._search_layer(qv, [ep], max(ef, k), 0)
        pairs = [(s, self.ids[nd]) for s, nd in res]
        pairs.sort(key=lambda p: (-p[0], p[1]))
        return pairs[:k]

    def __len__(self) -> int:
        return self._n
