from opadpo_tpu.models.llama import LlamaConfig  # noqa: F401
from opadpo_tpu.models.clip import ClipVisionConfig  # noqa: F401
from opadpo_tpu.models.llava import LlavaConfig, LlavaModel  # noqa: F401
