from occdepth_tpu.models.occdepth import OccDepthModel

__all__ = ["OccDepthModel"]
