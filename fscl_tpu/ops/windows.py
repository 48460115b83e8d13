"""Candidate-window geometry: nearest SNP and clamped evaluation windows.

Reference: /root/reference/scan-chromosome.c:39-94 (search_snppos +
init_scan_result).  Each candidate position gets the index of its nearest SNP
and an inclusive window of +-eval_range SNPs, clamped at chromosome edges
while preserving a 2*eval_range width when possible:

    if nearest - er < 0:        [0, min(2 er, n-1)]
    elif nearest + er > n-1:    [max(n-1-2 er, 0), n-1]
    else:                       [nearest - er, nearest + er]

All indices here are local to one chromosome block; vectorized numpy (host)
because it runs once per chromosome per scan, not per permutation.
"""

from __future__ import annotations

import numpy as np


def nearest_snp_index(pos, cand_pos):
    """Nearest-SNP index per candidate (ties -> the right SNP).

    Mirrors search_snppos (scan-chromosome.c:39-56): binary search, then pick
    the closer of the two bracketing SNPs with strict '<' (so an exact
    distance tie selects the right neighbor).
    """
    pos = np.asarray(pos)
    cand = np.asarray(cand_pos)
    n = pos.shape[0]
    j = np.searchsorted(pos, cand, side="left")  # pos[j-1] < cand <= pos[j]
    j = np.clip(j, 1, n - 1)
    i = j - 1
    left_closer = (cand - pos[i]) < (pos[j] - cand)
    out = np.where(left_closer, i, j)
    # candidates at/before the first SNP map to 0, past the last to n-1
    out = np.where(cand <= pos[0], 0, out)
    out = np.where(cand >= pos[-1], n - 1, out)
    return out.astype(np.int64)


def device_windows(pos_pad, n, cand_pos, eval_range):
    """jnp version of candidate_windows for on-device refinement.

    pos_pad: padded sorted positions (pad value = huge); n: real site count
    (static).  Returns (lo, hi) int32 with the same clamp semantics.
    """
    import jax.numpy as jnp

    j = jnp.clip(jnp.searchsorted(pos_pad, cand_pos, side="left"), 1, n - 1)
    i = j - 1
    left_closer = (cand_pos - pos_pad[i]) < (pos_pad[j] - cand_pos)
    ns = jnp.where(left_closer, i, j)
    ns = jnp.where(cand_pos <= pos_pad[0], 0, ns)
    ns = jnp.where(cand_pos >= pos_pad[n - 1], n - 1, ns)
    er = eval_range
    lo = ns - er
    hi = ns + er
    left = lo < 0
    lo = jnp.where(left, 0, lo)
    hi = jnp.where(left, jnp.minimum(2 * er, n - 1), hi)
    right = (~left) & (ns + er > n - 1)
    hi = jnp.where(right, n - 1, hi)
    lo = jnp.where(right, jnp.maximum(n - 1 - 2 * er, 0), lo)
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


def candidate_windows(pos, cand_pos, eval_range):
    """(nearest, lo, hi) per candidate with reference edge clamping."""
    pos = np.asarray(pos)
    n = pos.shape[0]
    ns = nearest_snp_index(pos, cand_pos)
    er = int(eval_range)
    lo = ns - er
    hi = ns + er
    # left-edge clamp (scan-chromosome.c:76-80)
    left = lo < 0
    lo = np.where(left, 0, lo)
    hi = np.where(left, np.minimum(2 * er, n - 1), hi)
    # right-edge clamp (scan-chromosome.c:81-85)
    right = ~left & (ns + er > n - 1)
    hi = np.where(right, n - 1, hi)
    lo = np.where(right, np.maximum(n - 1 - 2 * er, 0), lo)
    return ns, lo.astype(np.int64), hi.astype(np.int64)
