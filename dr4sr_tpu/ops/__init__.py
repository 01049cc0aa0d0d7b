from dr4sr_tpu.ops.attention import flash_attention, mha_reference  # noqa: F401
from dr4sr_tpu.ops.topk import masked_topk_scores  # noqa: F401
