"""Permutation checkpoint / resume.

The reference has no resume — only SIGINT dump-and-continue
(scan-chromosome.c:554-569) and the manual two-stage restart through
--output-bs / -b (SURVEY.md section 5).  Here: the permutation engine's state
(per-point permute_n / permute_p / finished flags, null-CLR reservoirs, rounds
completed, RNG round counter) serializes to one .npz after every chunk; a
resumed run reloads it, re-seeds the SAME key sequence, skips the completed
rounds, and continues — so a killed 100k-permutation run loses at most one
chunk of work.
"""

from __future__ import annotations

import os

import numpy as np


def save_checkpoint(path, result, rounds_done, seed):
    res_lengths = np.asarray([len(r or []) for r in result.null_clr])
    flat = (
        np.concatenate([np.asarray(r or [], dtype=np.float32) for r in result.null_clr])
        if res_lengths.sum()
        else np.zeros(0, dtype=np.float32)
    )
    tmp = f"{path}.tmp"
    np.savez_compressed(
        tmp,
        rounds_done=rounds_done,
        seed=seed,
        permute_n=result.permute_n,
        permute_p=result.permute_p,
        permute_finished=result.permute_finished,
        clr=result.clr,
        sweep_pos=result.sweep_pos,
        null_lengths=res_lengths,
        null_flat=flat,
    )
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path, result):
    """Restore permutation state into ``result``; returns (rounds_done, seed).

    Validates that the checkpoint belongs to the same scan (matching observed
    CLRs and positions).
    """
    with np.load(path) as z:
        if not np.array_equal(z["sweep_pos"], result.sweep_pos) or not np.allclose(
            z["clr"], result.clr, atol=1e-3
        ):
            raise ValueError(
                "checkpoint does not match this scan (positions/CLRs differ)"
            )
        result.permute_n[:] = z["permute_n"]
        result.permute_p[:] = z["permute_p"]
        result.permute_finished[:] = z["permute_finished"]
        lengths = z["null_lengths"]
        flat = z["null_flat"]
        off = 0
        for i, L in enumerate(lengths):
            result.null_clr[i] = flat[off : off + int(L)].tolist()
            off += int(L)
        return int(z["rounds_done"]), int(z["seed"])
