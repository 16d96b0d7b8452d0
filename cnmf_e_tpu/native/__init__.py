"""Native (C++) host-side components, loaded via ctypes.

The reference's only native code is a connected-components MEX used by all
merge functions (``graph_conn_comp_mex.cpp``, wrapped by
``graph_connected_comp.m`` with a MATLAB fallback). Here the C++ union-find
is built on demand with g++ and a pure-numpy union-find serves as fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libgraph_cc.so")
_SRC_PATH = os.path.join(_HERE, "graph_cc.cpp")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_SO_PATH)
                    or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", _SRC_PATH,
                     "-o", _SO_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.graph_connected_components.restype = ctypes.c_int32
            lib.graph_connected_components.argtypes = [
                ctypes.c_int32, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
            lib.graph_connected_components_dense.restype = ctypes.c_int32
            lib.graph_connected_components_dense.argtypes = [
                ctypes.c_int32,
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")]
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def _cc_numpy(adj: np.ndarray) -> tuple[np.ndarray, int]:
    """Pure-python union-find fallback."""
    n = adj.shape[0]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    src, dst = np.nonzero(np.triu(adj, 1))
    for a, b in zip(src.tolist(), dst.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    remap = {}
    labels = np.empty(n, np.int32)
    for i in range(n):
        r = find(i)
        if r not in remap:
            remap[r] = len(remap)
        labels[i] = remap[r]
    return labels, len(remap)


def connected_components(adj: np.ndarray) -> tuple[np.ndarray, int]:
    """Connected components of a dense symmetric adjacency matrix.

    Returns (labels (n,) int32 compact 0-based ids, n_components).
    """
    adj = np.ascontiguousarray(np.asarray(adj) != 0, dtype=np.uint8)
    n = adj.shape[0]
    if n == 0:
        return np.empty(0, np.int32), 0
    lib = _load()
    labels = np.empty(n, np.int32)
    if lib is not None:
        ncomp = lib.graph_connected_components_dense(np.int32(n), adj, labels)
        return labels, int(ncomp)
    return _cc_numpy(adj)


def connected_components_edges(n: int, src: np.ndarray, dst: np.ndarray
                               ) -> tuple[np.ndarray, int]:
    """Edge-list variant."""
    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    lib = _load()
    labels = np.empty(n, np.int32)
    if lib is not None:
        ncomp = lib.graph_connected_components(
            np.int32(n), np.int64(len(src)), src, dst, labels)
        return labels, int(ncomp)
    adj = np.zeros((n, n), np.uint8)
    adj[src, dst] = 1
    adj[dst, src] = 1
    return _cc_numpy(adj)
