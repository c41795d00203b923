from .server import (  # noqa: F401
    GenerationServer,
    Job,
    QueueFull,
    make_video_generate_fn,
    prepare_pipeline_kwargs,
    validate_request,
)
