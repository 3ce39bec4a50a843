"""Duration extraction: monotonic shortest path through CTC posteriors.

Reference: `/root/reference/utils/aligner/duration_extraction.py:52-85` —
builds a sparse graph over (mel_frame, token) nodes with right/down/
down-right moves and runs scipy Dijkstra. The graph is a DAG, so this is an
O(M*N) dynamic program; implemented twice:
  * a native C++ kernel (native/monotonic_align.cc, ctypes-loaded) for the
    offline extraction pipeline's hot loop,
  * a numpy fallback with identical semantics.
Durations are identical to the reference's (same path costs; the reference's
"last token per mel row wins" assignment is reproduced).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmonotonic_align.so"
_lib = None


def _build_native() -> bool:
    src = _NATIVE_DIR / "monotonic_align.cc"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(src)],
            check=True, capture_output=True)
        return True
    except Exception:
        return False


def _load_native():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build_native():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.monotonic_duration.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return lib
    except Exception:
        return None


def _durations_numpy(cost: np.ndarray) -> np.ndarray:
    rows, cols = cost.shape
    INF = np.inf
    dist = np.full((rows, cols), INF)
    choice = np.zeros((rows, cols), np.uint8)  # 0=right 1=down 2=diag
    dist[0, 0] = 0.0
    for j in range(1, cols):
        dist[0, j] = dist[0, j - 1] + cost[0, j]
    for i in range(1, rows):
        # down move for all columns
        down = dist[i - 1]
        diag = np.concatenate([[INF], dist[i - 1, :-1]])
        best = down.copy()
        ch = np.ones(cols, np.uint8)
        better = diag < best
        best[better] = diag[better]
        ch[better] = 2
        # right move is within-row sequential
        for j in range(cols):
            b, c = best[j], ch[j]
            if j > 0 and dist[i, j - 1] < b:
                b, c = dist[i, j - 1], 0
            dist[i, j] = b + cost[i, j]
            choice[i, j] = c
    row_token = np.full(rows, -1, np.int32)
    i, j = rows - 1, cols - 1
    while True:
        if row_token[i] < 0:
            row_token[i] = j
        if i == 0 and j == 0:
            break
        c = choice[i, j]
        if c == 0:
            j -= 1
        elif c == 1:
            i -= 1
        else:
            i -= 1
            j -= 1
    durations = np.zeros(cols, np.int32)
    for jj in row_token:
        durations[jj] += 1
    return durations


def extract_durations_beam(tokens: np.ndarray, posteriors: np.ndarray,
                           k: int = 10):
    """Beam-search alternative to the shortest-path DP.

    Semantics of the reference's `extract_durations_beam`
    (`/root/reference/utils/aligner/duration_extraction.py:88-110`): walk the
    mel rows top to bottom; each hypothesis may stay on its current token or
    advance by one; score is the running -log posterior of the visited cells;
    keep the `k` best (stable order: existing-beam order, stay before
    advance, ties preserved). A hypothesis whose advance step runs past the
    last token is kept with +inf score (it survives only if fewer than `k`
    finite candidates exist). Durations of a hypothesis are the bincount of
    its token-index path, so trailing never-visited tokens are absent (the
    returned vector can be shorter than `len(tokens)`).

    Returns (durations_list, (paths, scores)): `durations_list[0]` is the
    best hypothesis's durations, `paths` is an int (k, M) array of token
    indices per mel row, `scores` the matching (k,) path costs.
    """
    data = posteriors[:, tokens]
    m, n = data.shape
    with np.errstate(divide="ignore"):
        neglog = -np.log(data)
    # hypotheses: positions (b,) current token index, scores (b,),
    # paths (b, rows_so_far)
    pos = np.array([0], np.int64)
    # accumulate in the posteriors' dtype (reference: float32 running sums)
    # so near-tie orderings agree bit-for-bit with the oracle
    scores = np.array([neglog[0, 0]], neglog.dtype)
    paths = np.zeros((1, 1), np.int64)
    for i in range(1, m):
        # candidate order matters for stable tie-breaks: for each existing
        # hypothesis, stay (j) comes before advance (j+1)
        cand_pos = np.stack([pos, pos + 1], axis=1).reshape(-1)
        valid = cand_pos < n
        step = np.full(cand_pos.shape, np.inf, neglog.dtype)
        step[valid] = neglog[i, cand_pos[valid]]
        cand_scores = np.repeat(scores, 2) + step
        cand_paths = np.concatenate(
            [np.repeat(paths, 2, axis=0), cand_pos[:, None]], axis=1)
        keep = np.argsort(cand_scores, kind="stable")[:k]
        pos, scores, paths = cand_pos[keep], cand_scores[keep], cand_paths[keep]
    durations = [np.bincount(p) for p in paths]
    return durations, (paths, scores)


def extract_durations(tokens: np.ndarray, posteriors: np.ndarray,
                      use_native: bool = True) -> np.ndarray:
    """Args:
      tokens: (N,) int token ids of the transcript.
      posteriors: (M, V) frame-wise symbol posteriors (softmax output).
    Returns (N,) int32 durations summing to M.
    (reference extract_durations_with_dijkstra signature, :52)."""
    cost = np.ascontiguousarray(
        1.0 - posteriors[:, tokens], dtype=np.float32)
    rows, cols = cost.shape
    lib = _load_native() if use_native else None
    if lib is not None:
        out = np.zeros(cols, np.int32)
        lib.monotonic_duration(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows, cols, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    return _durations_numpy(cost)
