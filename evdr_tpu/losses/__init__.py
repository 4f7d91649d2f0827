from evdr_tpu.losses.distill import (
    spl_loss,
    infonce_supervised_loss,
    infonce_distillation_loss,
    score_preserving_loss,
    pairwise_distillation_loss,
    listwise_distillation_loss,
    lambda_loss,
    ranknce_loss,
    LOSS_REGISTRY,
    combined_loss,
)
