#!/bin/sh
# Round-5 measurement batch: one config at a time on the single TPU.
# Prerequisite: the round-5 statistic-grid defaults (stat positions=7,
# stat alphas=32) are in the tree — the canonical power run below PINS
# the shipped defaults, so run it only at the shipped configuration.
# The power reference sides (subprocesses, CPU) can run ahead of or
# concurrently with the TPU stages; every ours side needs the TPU.
set -x
cd "$(dirname "$0")/.."
# canonical power at the SHIPPED defaults (48 reps, pinned in PARITY.md)
python bench/power_recovery.py --ref-only --workers 2 --reps 48 2>>bench/r5_run.log
python bench/power_recovery.py --ours-only --reps 48 2>>bench/r5_run.log
# production-count power confirmation (VERDICT r4 item 9; records under
# power_recovery_n1000 with its own _p1000 artifacts)
python bench/power_recovery.py --reps 48 --permute 1000 2>>bench/r5_run.log
# narrow-sweep guard (strong alpha; statistic-grid regression watch)
python bench/power_recovery.py --reps 24 --sweep-alpha 1e-3 --workers 8 2>>bench/r5_run.log
python bench/power_recovery.py --reps 24 --sweep-alpha 1e-3 --densify 1 --positions 7 --ours-only 2>>bench/r5_run.log
# headline genome + cold-cache protocol + 20k bench
python bench/run_r4_genome1m.py 2>>bench/r5_run.log
python bench/run_r3_first.py 2>>bench/r5_run.log
python bench.py 2>>bench/r5_run.log
# canonical deep-tail number (round-neutral runner; also refreshed by
# run_r4_genome1m.py — this standalone pass is the quiet-host sample)
python bench/run_tail.py 2>>bench/r5_run.log
# lattice-fallback throughput (VERDICT r4 item 6)
python bench/measure_fallback.py 2>>bench/r5_run.log
# ms + asc/mixed parity gates
python bench/headline.py ms_neutral 2>>bench/r5_run.log
python bench/headline.py ms_sweep 2>>bench/r5_run.log
python bench/headline.py asc100k --ours-only 2>>bench/r5_run.log
python bench/headline.py mixed100k --ours-only 2>>bench/r5_run.log
python bench/make_round_table.py 5 --write
