from .snp_reader import load_snp_input  # noqa: F401
from .spectra_io import load_spectra, write_spectra  # noqa: F401
from .output import scan_output, write_null_distribution  # noqa: F401
