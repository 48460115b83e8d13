from .scan import ScanConfig, ScanResult, prewarm_scan, scan_genome  # noqa: F401
from .permute import PermuteConfig, scan_permute  # noqa: F401
from .pvalues import empirical_pvalues, chi2_tail_projection  # noqa: F401
