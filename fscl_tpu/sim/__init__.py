from .sample import (  # noqa: F401
    standard_neutral_spectrum,
    place_sweeps,
    sample_snps,
    subsample_ascertainment,
    random_ascertainment,
    write_snp_file,
    simulate_dataset,
)
