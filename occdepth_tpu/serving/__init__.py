from occdepth_tpu.serving.pipeline import ServingPipeline

__all__ = ["ServingPipeline"]
