from opadpo_tpu.ops.attention import multi_head_attention  # noqa: F401
from opadpo_tpu.ops.rope import apply_rope, rope_frequencies  # noqa: F401
from opadpo_tpu.ops.logprobs import (  # noqa: F401
    per_token_logprobs,
    per_token_entropy,
)
