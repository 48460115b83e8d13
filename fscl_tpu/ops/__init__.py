from .clr import (  # noqa: F401
    clr_grid,
    coarse_alpha_grid,
    fine_alpha_grids,
    two_stage_alpha_max,
)
from .windows import candidate_windows  # noqa: F401
from .permute import block_permutation_indices  # noqa: F401
