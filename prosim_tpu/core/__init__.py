from prosim_tpu.core.registry import registry  # noqa: F401
