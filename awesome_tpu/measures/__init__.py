from awesome_tpu.measures.losses import (  # noqa: F401
    se,
    ae,
    bce,
    total_variation,
    unaries_weight,
    unaries_weighted_loss,
    awesome_loss,
    fbms_joint_loss,
    gradient_penalty,
)
from awesome_tpu.measures.metrics import (  # noqa: F401
    iou,
    miou,
    pixel_accuracy,
    boundary_f1,
)
