"""ms-output -> SNPData adapters and the two-pass ms scan pipeline.

Reference: /root/reference/ms-input.c + the ms branch of main
(fscl.c:281-314).  Pass 1 concatenates ALL blocks into one long synthetic
chromosome (block b offset by b * segment_length) to estimate the background
spectrum; pass 2 re-streams the file block by block, scanning each as its own
chromosome and appending per-block output (typically with --max-only to build
null-distribution histograms over replicates, SURVEY.md section 4).

Reference quirks NOT replicated (both are bugs there):
  * folded sites whose derived count is already the minor allele got
    obs_freq = 0 (ms-input.c:74-77); we set min(d, n-d).
  * the C reopens the output with mode "w" per block, so only the last
    block's rows survive; we append.
"""

from __future__ import annotations

import numpy as np

from ..data import SNPData, build_snp_data
from ..utils import MSG_STATUS, cr_logmsg, logmsg
from .ms_parser import MsParser


def _block_sites(msb, seg_len, folded, first, size, offset, chrom):
    n_hap = msb.n_haplotypes
    take = size if size else n_hap - first
    sub = msb.haplotypes[first : first + take, :]
    d = sub.sum(axis=0).astype(np.int64)
    keep = (d > 0) & (d < take)
    pos = (msb.positions * seg_len).astype(np.int64) + offset
    pos = pos[keep]
    d = d[keep]
    if folded:
        freq = np.minimum(d, take - d)
    else:
        freq = d
    return (
        [chrom] * len(pos),
        pos,
        freq,
        np.full(len(pos), take, dtype=np.int64),
        np.full(len(pos), folded, dtype=bool),
    )


def ms_background(path, seg_len, folded, first, size) -> SNPData:
    """Pass 1: one concatenated dataset over all blocks (ms-input.c:25-91)."""
    acc = [[], [], [], [], []]
    n_blocks = 0
    with open(path) as f:
        parser = MsParser(f)
        while True:
            msb = parser.next_block()
            if msb is None:
                break
            parts = _block_sites(
                msb, seg_len, folded, first, size, n_blocks * seg_len, "ms"
            )
            acc[0].extend(parts[0])
            for i in range(1, 5):
                acc[i].append(parts[i])
            n_blocks += 1
    if n_blocks == 0:
        raise ValueError(f"no ms blocks found in {path}")
    cr_logmsg(MSG_STATUS, "ms background: %d blocks", n_blocks)
    return build_snp_data(
        acc[0],
        np.concatenate(acc[1]),
        np.concatenate(acc[2]),
        np.concatenate(acc[3]),
        np.concatenate(acc[4]),
    )


def iter_ms_blocks(path, seg_len, folded, first, size):
    """Pass 2: one SNPData per block (ms-input.c:93-151), block index as name."""
    with open(path) as f:
        parser = MsParser(f)
        b = 0
        while True:
            msb = parser.next_block()
            if msb is None:
                return
            chroms, pos, freq, depth, fold = _block_sites(
                msb, seg_len, folded, first, size, 0, str(b)
            )
            b += 1
            if len(pos) == 0:
                continue
            yield build_snp_data(chroms, pos, freq, depth, fold)


def ms_pipeline(args, pipeline_fn):
    """Two-pass ms scan driving the shared pipeline (fscl.c:281-314)."""
    from .output import scan_output, write_null_distribution

    if args.ms_segment_length <= 0:
        logmsg(
            2,
            "ms input needs --ms-segment-length > 0 (the reference would "
            "multiply positions by 0); pass e.g. --ms-segment-length 1000000",
        )
        raise SystemExit(255)

    bg_data = ms_background(
        args.msfile, args.ms_segment_length, args.ms_folded,
        args.ms_sample_first, args.ms_sample_size,
    )
    # background + tables from the concatenated pass
    from ..models import background_fsp, build_tables
    from ..io.spectra_io import load_spectra, write_spectra

    loaded = load_spectra(args.background_spectrum) if args.background_spectrum else None
    fsp = background_fsp(
        bg_data.obs_freq, bg_data.depth_p, bg_data.folded, bg_data.sample_depths,
        force_neutral_spectrum=args.force_neutral_spectrum,
        loaded_spectra=loaded,
        include_invariant=args.include_invariant,
        compat_mirror_unfolded=args.compat_mirror_unfolded,
    )
    if args.output_bs:
        write_spectra(args.output_bs, bg_data.sample_depths, fsp)
    if args.no_scan:
        return 0

    tables = build_tables(
        fsp, bg_data.sample_depths, grid_points=args.grid_points,
        asc_depth=args.asc_depth, asc_min_freq=args.asc_minimum_freq,
        ascbias_background_only=args.ascbias_background_only,
        include_invariant=args.include_invariant,
    )

    from ..engine import PermuteConfig, ScanConfig, scan_genome, scan_permute
    from ..engine.permute import prewarm_hist_permute
    from ..ops.lattice import LatticeTables

    lattice = LatticeTables(tables.table, tables.grid_points)
    # the reference's single pipeline honors every flag in both -f and -m
    # modes (fscl.c:281-314 passes the same globals); mirror that here —
    # --no-hist and --checkpoint apply to ms input too (VERDICT r3)
    scan_cfg = ScanConfig(
        eval_range=args.eval_range, bp_resl=args.bp_resl,
        small_grid_sp=args.fine_grid_spacing,
        large_grid_sp=args.coarse_grid_spacing,
        chunk=args.chunk, refine=not args.no_refine,
        use_hist=not args.no_hist,
    )

    first = True
    block_i = 0
    for data in iter_ms_blocks(
        args.msfile, args.ms_segment_length, args.ms_folded,
        args.ms_sample_first, args.ms_sample_size,
    ):
        data.attach_model(tables)
        from ..engine import prewarm_scan

        prewarm_scan(data, tables, scan_cfg)
        perm_cfg = None
        if args.n_permute > 0:
            perm_cfg = PermuteConfig(
                n_permute=args.n_permute, permute_nbp=args.permute_nbp,
                scan_width_mb=args.sweep_width,
                chunk_replicates=args.chunk_replicates, seed=args.seed,
                alpha_factor=args.alpha_factor,
                use_hist=not args.no_hist,
                # one checkpoint per block: the identity check
                # (engine/checkpoint.py) ties a file to one scan's
                # positions/CLRs, and each ms block is its own scan
                checkpoint_path=(
                    f"{args.checkpoint}.block{block_i}"
                    if args.checkpoint else None
                ),
            )
            # permutation programs compile in the background while the
            # block scans (same prewarm the -f pipeline runs; repeat
            # blocks share shapes, so later submits dedup via _done_keys)
            prewarm_hist_permute(data, tables, scan_cfg, perm_cfg)
        result = scan_genome(data, tables, scan_cfg, lattice=lattice)
        if perm_cfg is not None:
            scan_permute(
                data, tables, result, scan_cfg, perm_cfg, lattice=lattice
            )
        scan_output(
            args.output_file, data, result,
            maximum_only=args.max_only, n_permute=args.n_permute,
            prepend_label=args.prepend_label, append=not first,
        )
        if args.n_permute > 0:
            write_null_distribution(
                args.output_file, data, result, append=not first
            )
        first = False
        block_i += 1
    return 0
