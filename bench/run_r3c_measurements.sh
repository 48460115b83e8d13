#!/bin/sh
# Round-3 measurement batch: one config at a time on the single TPU.
# Ours-only where the reference TSV/rate from round 2 is still valid
# (same data files, same reference binary semantics); the ms configs
# re-run the reference because the append-mode output patch changes its
# TSV row coverage (bench/build_ref.sh).
set -x
cd "$(dirname "$0")/.."
python bench.py 2>>bench/r3c_run.log
python bench/headline.py ms_neutral 2>>bench/r3c_run.log
python bench/headline.py ms_sweep 2>>bench/r3c_run.log
python bench/headline.py asc100k --ours-only 2>>bench/r3c_run.log
python bench/headline.py mixed100k --ours-only 2>>bench/r3c_run.log
python bench/headline.py genome1m --ours-only 2>>bench/r3c_run.log
