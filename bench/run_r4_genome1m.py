"""Round-4 genome1m measurement batch: one TPU process, warm cache.

Measures the round-4 engine (fused genome-wide scan stages, shared
program classes, per-chromosome hoisted prefix sums, bf16 selection
contraction, boost-64 pruning tail) under the steady-state protocol
(BASELINE.md): persistent compile cache present, device-init tax
absorbed, phases timed separately.  Headline (genome1m) first so a
wall-clock cutoff loses only secondary stages.

Does NOT touch first_run_* keys — those come exclusively from the cold
persistent-cache protocol (bench/run_r3_first.py, round-independent).

Run EXCLUSIVELY on the axon tunnel:  python bench/run_r4_genome1m.py
"""

import copy
import importlib.util
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench as _b  # noqa: F401  (compile cache)

import numpy as np

spec = importlib.util.spec_from_file_location(
    "headline", REPO / "bench" / "headline.py"
)
H = importlib.util.module_from_spec(spec)
spec.loader.exec_module(H)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax.numpy as jnp

    t0 = time.monotonic()
    jnp.zeros(8).sum().item()
    log(f"device-init tax: {time.monotonic()-t0:.0f}s")

    import fscl_tpu.engine.permute as P
    import fscl_tpu.engine.scan as S

    # ---- genome1m headline (round-4 engine, warm cache) ------------------
    path = H.gen_genome1m()
    ours_out = H.DATA / "headline_genome1m.ours.tsv"
    ref_out = H.DATA / "headline_genome1m.ref.tsv"
    out = H._run_ours_phased(path, 100_000, out_tsv=ours_out)
    if ref_out.exists():
        out.update(H.compare_parity(ours_out, ref_out))
    out["perm_stats"] = {
        k: round(v, 2) if isinstance(v, float) else v
        for k, v in P.last_stats.items()
    }
    out["scan_stats"] = {
        k: round(v, 2) if isinstance(v, float) else v
        for k, v in S.last_stats.items()
    }
    H.merge_results("genome1m", out)
    log(f"genome1m (r4): {json.dumps(out)}")

    # ---- at-scale neutral-spectrum parity (ours side) --------------------
    out2 = H.genome1m_neutral_parity(run_ref_side=False)
    H.merge_results("genome1m", out2)
    log(f"neutral parity: {json.dumps(out2)}")

    # ---- pruning-tail profile (round-4 boost ladder) ---------------------
    from fscl_tpu.engine import PermuteConfig, ScanConfig, scan_genome, \
        scan_permute
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables

    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    result0 = scan_genome(data, tables, cfg)
    keep = np.array([
        np.where(result0.chr_id == c)[0][
            np.argmax(result0.clr[result0.chr_id == c])
        ]
        for c in range(data.n_chromosomes)
    ])
    pc = PermuteConfig(n_permute=4096, chunk_replicates=32, seed=1)
    walls = []
    for rep in range(2):
        tail = copy.deepcopy(result0)
        tail.permute_finished[:] = True
        tail.permute_finished[keep] = False
        t0 = time.monotonic()
        scan_permute(data, tables, tail, cfg, copy.deepcopy(pc))
        walls.append(time.monotonic() - t0)
        pr = int(tail.permute_n[keep].sum())
    log(f"tail({len(keep)} pts): cold {walls[0]:.1f}s warm {walls[1]:.1f}s, "
        f"{pr} pr -> {pr / walls[1]:.0f} pr/s; stats {P.last_stats}")
    H.merge_results("genome1m", {
        "tail_points": int(len(keep)), "tail_point_rounds": pr,
        "tail_pr_per_s_warm": round(pr / walls[1], 1),
        "tail_pr_per_s_cold": round(pr / walls[0], 1),
    })


if __name__ == "__main__":
    main()
