from evdr_tpu.parallel.mesh import make_mesh, make_mesh_2d, shard_docs, replicate
from evdr_tpu.parallel.sharded_index import ShardedIndex, build_sharded_index
from evdr_tpu.parallel.topk import sharded_maxsim, sharded_topk
from evdr_tpu.parallel.gspmd import gspmd_maxsim, gspmd_topk
from evdr_tpu.parallel.multihost import (
    MultihostSearchCoordinator,
    build_multihost_index,
    global_doc_mesh,
    global_doc_mesh_2d,
    init_multihost,
    replicate_global,
    shard_docs_global,
)
from evdr_tpu.parallel.train_sharded import build_sharded_train_step
