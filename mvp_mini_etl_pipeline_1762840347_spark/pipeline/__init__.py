from .runner import PipelineRun, run_pipeline  # noqa: F401
