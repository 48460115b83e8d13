#!/usr/bin/env python
"""Measure the reference C binary on the bench task; freeze baseline_c.json.

Runs bench/fscl_ref (built from /root/reference with stub GSL) on the same
dataset bench.py uses, with and without permutations, single-core and
multi-threaded.  Permutation throughput = sum(permute_n) / (t_perm_run -
t_scan_run), in point-rounds/sec (see bench.py).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import COARSE, DATA, FINE, N_PERMUTE, ensure_data  # noqa: E402

BIN = REPO / "bench" / "fscl_ref"


def run(args, timeout=7200):
    t0 = time.monotonic()
    subprocess.run(args, check=True, capture_output=True, timeout=timeout)
    return time.monotonic() - t0


def main():
    ensure_data()
    out = REPO / "bench" / "data" / "ref_out.tsv"
    base_args = [
        str(BIN), "-f", str(DATA), "-o", str(out),
        "-g", str(FINE), "-G", str(COARSE), "-v", "0",
    ]
    t_scan = run(base_args)
    print(f"reference scan (1 thread): {t_scan:.1f}s", file=sys.stderr)

    t_perm_total = run(base_args + ["-p", str(N_PERMUTE)])
    rows = [l.split() for l in open(out)]
    point_rounds = sum(int(r[5]) for r in rows)
    t_perm = max(t_perm_total - t_scan, 1e-9)
    print(
        f"reference scan+perm (1 thread): {t_perm_total:.1f}s, "
        f"{point_rounds} point-rounds -> {point_rounds / t_perm:.1f}/s",
        file=sys.stderr,
    )

    import os

    nthreads = os.cpu_count() or 2
    # NOTE: the reference's option parser segfaults on "--long value";
    # it requires "--long=value" (cmdline-utils.c long-option handling).
    t_perm_mt_total = run(
        base_args + ["-p", str(N_PERMUTE), f"--n-threads={nthreads}"]
    )
    rows = [l.split() for l in open(out)]
    point_rounds_mt = sum(int(r[5]) for r in rows)

    result = dict(
        config=dict(
            data=str(DATA.name), fine=FINE, coarse=COARSE, n_permute=N_PERMUTE
        ),
        t_scan_1thread=t_scan,
        t_scan_plus_perm_1thread=t_perm_total,
        point_rounds=point_rounds,
        point_rounds_per_sec=point_rounds / t_perm,
        t_scan_plus_perm_8thread=t_perm_mt_total,
        point_rounds_8thread=point_rounds_mt,
        cpu="single x86-64 core (see /proc/cpuinfo), gcc -O2 -march=native -fopenmp",
    )
    (REPO / "bench" / "baseline_c.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
