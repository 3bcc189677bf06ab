"""Reverse Cuthill-McKee reordering.

Reference: core/reorder/rcm.cpp (reference 301 LoC; OMP parallel version
omp/reorder/rcm_kernels.cpp:875; `starting_strategy {minimum_degree,
pseudo_peripheral}` rcm.hpp:63, default pseudo_peripheral :145).  GPU
backends in the reference fall back to CPU, so a host implementation IS the
parity behavior.  On TPU, RCM matters doubly: reducing bandwidth turns
general matrices into Dia-friendly banded ones (matrix/dia.py), which is the
gather-free fast path."""

from __future__ import annotations

from collections import deque

import numpy as np

from ..matrix.diagonal import Permutation


def _bfs_levels(indptr, indices, start, n):
    level = np.full(n, -1, np.int64)
    level[start] = 0
    q = deque([start])
    order = [start]
    while q:
        u = q.popleft()
        for v in indices[indptr[u] : indptr[u + 1]]:
            if level[v] < 0:
                level[v] = level[u] + 1
                q.append(v)
                order.append(v)
    return level, order


def _pseudo_peripheral(indptr, indices, comp_nodes, degrees):
    """George-Liu pseudo-peripheral node finder."""
    n = len(degrees)
    u = comp_nodes[np.argmin(degrees[comp_nodes])]
    last_ecc = -1
    while True:
        level, order = _bfs_levels(indptr, indices, u, n)
        comp_levels = level[comp_nodes]
        ecc = comp_levels.max()
        if ecc <= last_ecc:
            return u
        last_ecc = ecc
        far = comp_nodes[comp_levels == ecc]
        u = far[np.argmin(degrees[far])]


def rcm_permutation(csr, starting_strategy: str = "pseudo_peripheral") -> np.ndarray:
    """Returns permutation p such that A[p][:, p] has reduced bandwidth.

    p[i] = old index of new row i (forward permutation, matching
    Permutable/Csr.symm_permute semantics)."""
    sp = csr.to_scipy().tocsr()
    sym = (sp + sp.T).tocsr()
    n = sym.shape[0]
    indptr, indices = sym.indptr, sym.indices
    degrees = np.diff(indptr)
    visited = np.zeros(n, bool)
    cm = []
    for seed in range(n):
        if visited[seed]:
            continue
        comp_level, comp_order = _bfs_levels(indptr, indices, seed, n)
        comp_nodes = np.asarray([v for v in comp_order])
        if starting_strategy == "pseudo_peripheral":
            start = _pseudo_peripheral(indptr, indices, comp_nodes, degrees)
        else:  # minimum_degree
            start = comp_nodes[np.argmin(degrees[comp_nodes])]
        # Cuthill-McKee BFS with degree-sorted neighbor visits
        visited[start] = True
        q = deque([start])
        while q:
            u = q.popleft()
            cm.append(u)
            nb = indices[indptr[u] : indptr[u + 1]]
            nb = nb[~visited[nb]]
            visited[nb] = True
            for v in nb[np.argsort(degrees[nb], kind="stable")]:
                q.append(v)
    return np.asarray(cm[::-1], dtype=np.int64)  # reverse


class RcmFactory:
    """rcm.hpp factory."""

    def __init__(self, starting_strategy: str = "pseudo_peripheral"):
        assert starting_strategy in ("pseudo_peripheral", "minimum_degree")
        self.starting_strategy = starting_strategy

    def generate(self, A) -> Permutation:
        csr = A.to_csr() if hasattr(A, "to_csr") else A
        return Permutation.create(rcm_permutation(csr, self.starting_strategy))


class Rcm:
    @staticmethod
    def build(**kw):
        return RcmFactory(**kw)


def bandwidth(csr) -> int:
    sp = csr.to_scipy().tocoo()
    if sp.nnz == 0:
        return 0
    return int(np.abs(sp.row - sp.col).max())
