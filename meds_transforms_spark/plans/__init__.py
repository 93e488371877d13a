from meds_transforms_spark.plans.pipeline import Pipeline, PipelineConfig, StageSpec

__all__ = ["Pipeline", "PipelineConfig", "StageSpec"]
