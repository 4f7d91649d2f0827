from evdr_tpu.ops.maxsim import (
    maxsim,
    maxsim_xla,
    maxsim_numpy,
    score_multi_vector,
    score_single_vector,
)
from evdr_tpu.ops.pallas_maxsim import maxsim_pallas

# storage-tier quantizers/scorers (int8 / packed-int4 / PQ+OPQ)
from evdr_tpu.ops.quantize import dequantize_int8, quantize_tokens_int8
from evdr_tpu.ops.int4 import (
    dequantize_int4,
    maxsim_int4_xla,
    quantize_tokens_int4,
)
from evdr_tpu.ops.pq import (
    decode_pq,
    encode_pq,
    encode_pq_device,
    expand_books,
    maxsim_pq_xla,
    train_opq,
    train_pq,
)
