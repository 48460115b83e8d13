"""shard_map'd scan and permutation steps over the (perm, site) mesh.

Replaces the reference's pthread work queues (scan-chromosome.c:162-216,
469-487): the candidate axis is block-sharded over "site" devices and the
permutation-replicate axis over "perm" devices.  Site data and the model
table are replicated (they are small relative to the [R, P, A] compute), so
the only collective is the psum that merges exceedance counts — the merge the
dead master/slave stub (fscl-master.c) never implemented.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.clr import two_stage_alpha_max


def sharded_scan_eval(mesh, table_flat, row, pos, null, cand, lo, hi,
                      *, grid_points, chunk=8):
    """Observed scan: candidates sharded over every device in the mesh.

    The (perm, site) mesh is flattened for the observed pass — there is no
    replicate axis yet, so all devices take a slice of candidates.
    Candidate count must be divisible by the device count (callers pad).
    """

    def local(cand_l, lo_l, hi_l):
        return two_stage_alpha_max(
            table_flat, row, pos, null, cand_l, lo_l, hi_l,
            grid_points=grid_points, chunk=chunk,
        )

    spec = P(("perm", "site"))
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec),
    )
    return f(cand, lo, hi)


def sharded_permute_chunk(
    mesh,
    table_flat,
    row_gen,
    null_gen,
    sigma,
    pos_pad,
    cand,
    lo,
    hi,
    thresholds,
    *,
    grid_points,
    chunk,
    start,
    n,
    w_pad,
):
    """One permutation chunk: replicates over "perm", candidates over "site".

    sigma [R, N_genome] is sharded over "perm"; cand/lo/hi/thresholds [P]
    over "site"; genome attribute arrays and the table are replicated.
    Returns (clr [R, P] sharded (perm, site), exceed [P] psum'd over perm).
    R and P must be divisible by the respective mesh axis sizes.
    """

    def local(sigma_l, cand_l, lo_l, hi_l, thr_l):
        def one_rep(sig_r):
            idx = jax.lax.dynamic_slice(sig_r, (start,), (n,))
            row = jnp.pad(row_gen[idx], (0, w_pad - n))
            null = jnp.pad(null_gen[idx], (0, w_pad - n))
            clr, _ = two_stage_alpha_max(
                table_flat, row, pos_pad, null, cand_l, lo_l, hi_l,
                grid_points=grid_points, chunk=chunk,
            )
            return clr

        clr = jax.lax.map(one_rep, sigma_l)  # [R_local, P_local]
        exceed = (clr >= thr_l[None, :]).sum(axis=0).astype(jnp.int32)
        exceed = jax.lax.psum(exceed, "perm")
        return clr, exceed

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("perm"), P("site"), P("site"), P("site"), P("site")),
        out_specs=(P("perm", "site"), P("site")),
    )
    return f(sigma, cand, lo, hi, thresholds)
