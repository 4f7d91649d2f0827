from evdr_tpu.ops.maxsim import (
    maxsim,
    maxsim_xla,
    maxsim_numpy,
    score_multi_vector,
    score_single_vector,
)
from evdr_tpu.ops.pallas_maxsim import maxsim_pallas
