from lemevit_tpu.models.lemevit import LeMeBlock, LeMeViT  # noqa: F401
from lemevit_tpu.models.registry import (  # noqa: F401
    FEATURE_CHANNELS,
    create_model,
    list_models,
    variant_config,
    lemevit_tiny,
    lemevit_small,
    lemevit_base,
    lemevit_tiny_v2,
    lemevit_small_v2,
    vit_tiny,
)
