from occdepth_tpu.losses.ssc import (
    ce_ssc_loss,
    frustum_proportion_loss,
    geo_scal_loss,
    sem_scal_loss,
)
from occdepth_tpu.losses.crp import relation_loss
from occdepth_tpu.losses.depth import depth_cls_loss
from occdepth_tpu.losses.metrics import SSCMetrics, confusion_update

__all__ = [
    "ce_ssc_loss",
    "sem_scal_loss",
    "geo_scal_loss",
    "frustum_proportion_loss",
    "relation_loss",
    "depth_cls_loss",
    "SSCMetrics",
    "confusion_update",
]
