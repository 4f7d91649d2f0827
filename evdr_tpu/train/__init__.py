from evdr_tpu.train.config import TrainConfig
from evdr_tpu.train.harness import (
    DatasetBundle,
    load_dataset_bundle,
    init_student,
    train_dataset_mf,
    run_training,
)
