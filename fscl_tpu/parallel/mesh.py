"""Device-mesh construction for the sweep scan.

The reference's parallelism is pthread work queues over scan intervals and
permutation rounds plus a dead master/slave socket stub
(/root/reference/scan-chromosome.c:162-216, 469-487; fscl-master.c).  The
TPU-native equivalent (SURVEY.md sections 2, 5) is a 2-D device mesh:

  axis "perm": permutation replicates — embarrassingly parallel,
               DCN-friendly across hosts; exceedance counts merge via psum.
  axis "site": candidate positions / scan points — ICI-friendly within a
               host; sites are replicated so no halo exchange is needed for
               windows (windows read sites, which are identical everywhere;
               only the candidate axis is partitioned).

For multi-host runs call jax.distributed.initialize() before building the
mesh; jax.devices() then spans all hosts and the same code runs SPMD.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_scan_mesh(n_perm=None, n_site=None, devices=None) -> Mesh:
    """Factor the device list into a (perm, site) mesh.

    Defaults: put most parallelism on the permutation axis (it scales with
    no communication); the site axis absorbs the rest.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_perm is None and n_site is None:
        # perm-major: ALL devices go to the replicate axis (it scales with
        # zero collectives); the site axis exists for callers that request
        # it explicitly.  Every production consumer shards over the axis
        # product ("perm","site"), so the factoring is behavior-neutral for
        # them — this default just makes the policy match the docstring.
        n_perm, n_site = n, 1
    elif n_perm is None:
        n_perm = n // n_site
    elif n_site is None:
        n_site = n // n_perm
    if n_perm * n_site != devices.size:
        raise ValueError(
            f"mesh {n_perm}x{n_site} != {devices.size} devices"
        )
    return Mesh(devices.reshape(n_perm, n_site), ("perm", "site"))
