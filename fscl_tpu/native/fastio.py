"""numpy-facing wrapper over the _fastio C extension.

Importing this module raises ImportError when the extension is not built;
callers (io/snp_reader.py, io/ms_parser.py) fall back to pure Python.
Build with: cd fscl_tpu/native && python setup.py build_ext --inplace
"""

from __future__ import annotations

import numpy as np

from . import _fastio  # noqa: F401  (ImportError propagates to callers)


def parse_snp_file(path):
    """-> (list[str] chr, int64 pos, int64 freq, int64 size, int64 folded)."""
    chrs, pos_b, freq_b, size_b, fold_b = _fastio.parse_snp_file_raw(str(path))
    return (
        chrs,
        np.frombuffer(pos_b, dtype=np.int64),
        np.frombuffer(freq_b, dtype=np.int64),
        np.frombuffer(size_b, dtype=np.int64),
        np.frombuffer(fold_b, dtype=np.int64),
    )


def parse_ms_haplotypes(lines):
    """list[bytes] of 0/1 rows -> uint8 matrix [n_hap, n_poly]."""
    buf, n_hap, n_poly = _fastio.parse_ms_haplotypes(lines)
    return np.frombuffer(buf, dtype=np.uint8).reshape(n_hap, n_poly)
