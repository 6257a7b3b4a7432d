from lemevit_tpu.attn.reference import sdpa  # noqa: F401
from lemevit_tpu.attn.modules import (  # noqa: F401
    StandardAttention,
    CrossAttention,
    DualCrossAttention,
    DualCrossAttentionV2,
)
