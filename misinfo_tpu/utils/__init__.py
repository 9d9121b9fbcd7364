from misinfo_tpu.utils.tracing import stage_timer, Tracer  # noqa: F401
