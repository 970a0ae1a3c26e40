from aasist_tpu.evaluation.metrics import (  # noqa: F401
    compute_det_curve,
    compute_eer,
    compute_tdcf,
    obtain_asv_error_rates,
    calculate_tdcf_eer,
    ASVSPOOF2019_COST_MODEL,
)
from aasist_tpu.evaluation.scorefile import (  # noqa: F401
    write_score_file,
    read_score_file,
)
