import prosim_tpu.models.scene_encoder  # noqa: F401
import prosim_tpu.models.prompt_encoder  # noqa: F401
import prosim_tpu.models.decoder  # noqa: F401
import prosim_tpu.models.policy  # noqa: F401
import prosim_tpu.models.prosim  # noqa: F401
