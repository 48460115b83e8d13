"""Round-3 measurement batch: all TPU-side numbers in ONE process.

The axon tunnel charges a flat 3-8 min worker-init tax per process, so the
round's measurements run back-to-back here: a per-stage scan profile (to
guide scan optimization), the genome1m headline (ours) with the
shape-warming permutation engine, the pruning-tail profile, then asc100k
and mixed100k (ours).  Results merge incrementally into
headline_results.json after each stage, so a crash loses only later stages.

Run EXCLUSIVELY on the axon tunnel:  python bench/run_r3_measurements.py
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


def scan_profile(path):
    """Per-stage scan walls over the first 8 chromosomes (warm)."""
    from fscl_tpu.engine import ScanConfig, scan_genome
    from fscl_tpu.engine.scan import (
        _ChromosomeBlock, _HistScanContext, chromosome_candidates,
        make_scan_hist_tables, refine_positions,
    )
    from fscl_tpu.io import load_snp_input
    from fscl_tpu.models import background_fsp, build_tables
    from fscl_tpu.ops.lattice import LatticeTables

    data = load_snp_input(path)
    fsp = background_fsp(
        data.obs_freq, data.depth_p, data.folded, data.sample_depths
    )
    tables = build_tables(fsp, data.sample_depths, grid_points=2048)
    data.attach_model(tables)
    cfg = ScanConfig(small_grid_sp=1000, large_grid_sp=100000)
    lattice = LatticeTables(tables.table, tables.grid_points)
    G = tables.grid_points

    walls = []
    for it in range(3):
        t0 = time.perf_counter()
        scan_genome(data, tables, cfg, lattice=lattice)
        walls.append(round(time.perf_counter() - t0, 2))
        log(f"scan total [{it}]: {walls[-1]}s")

    hist_ht = make_scan_hist_tables(
        data, tables, cfg.hist_alphas, decimate=cfg.hist_decimate
    )
    r_tot = dict(blk=0.0, hctx=0.0, dense=0.0, refine=0.0, exact=0.0)
    for c, cl in enumerate(data.chr_limits[:8]):
        t0 = time.perf_counter()
        blk = _ChromosomeBlock(data, cl, lattice)
        t1 = time.perf_counter()
        hctx = _HistScanContext(hist_ht, data, cl, cfg)
        t2 = time.perf_counter()
        cand, valid, istart, iend = chromosome_candidates(cl, cfg)
        n_int, J = cand.shape
        clr, la = hctx.eval_max(cand.reshape(-1))
        t3 = time.perf_counter()
        clr = np.where(valid.reshape(-1), clr, -np.inf).reshape(n_int, J)
        jbest = np.argmax(clr, axis=1)
        rr = np.arange(n_int)
        best_pos = cand[rr, jbest]
        cand2 = refine_positions(best_pos, istart, iend, 128)
        clr2, la2 = hctx.eval_max(cand2.reshape(-1))
        t4 = time.perf_counter()
        blk.eval_candidates(best_pos, cfg, G)
        t5 = time.perf_counter()
        log(f"[chr{c}] n={cl.n_snps} blk {t1-t0:.2f} hctx {t2-t1:.2f} "
            f"dense {t3-t2:.2f} refine {t4-t3:.2f} exact {t5-t4:.2f}")
        for k, v in zip(r_tot, (t1-t0, t2-t1, t3-t2, t4-t3, t5-t4)):
            r_tot[k] += v
    log(f"scan stage totals over 8 chrs: "
        f"{ {k: round(v, 2) for k, v in r_tot.items()} }")
    H.merge_results("genome1m", {
        "scan_walls_s": walls,
        "scan_stage_8chr": {k: round(v, 2) for k, v in r_tot.items()},
    })


def main():
    import jax.numpy as jnp

    t0 = time.monotonic()
    jnp.zeros(8).sum().item()
    log(f"device-init tax: {time.monotonic()-t0:.0f}s")

    path = H.gen_genome1m()

    # ---- scan stage profile (guides scan optimization) -------------------
    scan_profile(path)

    # ---- genome1m ours (headline) + parity + calibration -----------------
    import fscl_tpu.engine.permute as P

    ours_out = H.DATA / "headline_genome1m.ours.tsv"
    ref_out = H.DATA / "headline_genome1m.ref.tsv"
    out = H._run_ours_phased(path, 100_000, out_tsv=ours_out)
    if ref_out.exists():
        out.update(H.compare_parity(ours_out, ref_out))
    log(f"perm stats: {P.last_stats}")
    out["perm_stats"] = {
        k: round(v, 2) if isinstance(v, float) else v
        for k, v in P.last_stats.items()
    }
    H.merge_results("genome1m", out)
    log(f"genome1m done: {json.dumps(out)}")

    # ---- pruning-tail profile on the same dataset ------------------------
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
    log(f"tail({len(keep)} immortal pts): cold {walls[0]:.1f}s "
        f"warm {walls[1]:.1f}s, {pr} pr -> {pr / walls[1]:.0f} pr/s; "
        f"stats {P.last_stats}")
    H.merge_results("genome1m", {
        "tail_points": int(len(keep)), "tail_point_rounds": pr,
        "tail_pr_per_s_warm": round(pr / walls[1], 1),
        "tail_pr_per_s_cold": round(pr / walls[0], 1),
    })

    # ---- asc100k ours ----------------------------------------------------
    apath = H.gen_asc100k()
    a_ours = H.DATA / "headline_asc100k.ours.tsv"
    a_ref = H.DATA / "headline_asc100k.ref.tsv"
    aout = H._run_ours_phased(apath, 10_000, asc_depth=20, asc_min=2,
                              out_tsv=a_ours)
    if a_ref.exists():
        aout.update(H.compare_parity(a_ours, a_ref))
    H.merge_results("asc100k", aout)
    log(f"asc100k done: {json.dumps(aout)}")

    # ---- mixed100k ours --------------------------------------------------
    mpath = H.gen_mixed100k()
    m_ours = H.DATA / "headline_mixed100k.ours.tsv"
    m_ref = H.DATA / "headline_mixed100k.ref.tsv"
    mout = H._run_ours_phased(mpath, 10_000, out_tsv=m_ours)
    if m_ref.exists():
        mout.update(H.compare_parity(m_ours, m_ref))
    H.merge_results("mixed100k", mout)
    log(f"mixed100k done: {json.dumps(mout)}")


if __name__ == "__main__":
    main()
