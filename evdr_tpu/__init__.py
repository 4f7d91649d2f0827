"""evdr_tpu — TPU-native Efficient Visual Document Retrieval.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
kimjy-st/Efficient-Visual-Document-Retrieval: ColPali/ColQwen-style multi-vector
visual-document retrieval with MaxSim late-interaction scoring, index compression
via score distillation, MTEB-compatible evaluation, and mesh-sharded serving.

Layout
------
- ``evdr_tpu.data``     npz payload I/O, ragged->dense packing, masks, registry
- ``evdr_tpu.ops``      MaxSim scoring: XLA reference + fused Pallas TPU kernel
- ``evdr_tpu.losses``   distillation loss zoo (pure functions of score matrices)
- ``evdr_tpu.eval``     retrieval metrics (nDCG/mAP/Recall/P/MRR) + evaluator
- ``evdr_tpu.train``    unified training harness (replaces the reference's 24 scripts)
- ``evdr_tpu.parallel`` device-mesh sharding of the index, sharded scoring/top-k
- ``evdr_tpu.tools``    offline tooling: split/dedup/pseudo-query gen/reporting
- ``evdr_tpu.utils``    logging, seeding, profiling helpers
"""

__version__ = "0.1.0"
