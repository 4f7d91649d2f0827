from evdr_tpu.data.npz_io import (
    load_npz,
    load_payload,
    load_query_payload,
    load_init_payload,
    load_train_payload,
    load_test_payload,
    save_compressed_npz,
    tokens_to_object,
)
from evdr_tpu.data.packing import (
    l2_normalize,
    pad_tokens_object,
    pad_mask_object,
    preprocess_docs,
    preprocess_queries,
    pad_axis_to_multiple,
)
from evdr_tpu.data.align import align_by_docid
from evdr_tpu.data.registry import DATASETMAP
from evdr_tpu.data.synthetic import make_synthetic_corpus, save_synthetic_npz
