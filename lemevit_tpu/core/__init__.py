from lemevit_tpu.core.layers import (  # noqa: F401
    ConvBN,
    ConvStem,
    DWConv,
    DropPath,
    Mlp,
    MetaTokenDownsample,
    trunc_normal_init,
    torch_conv_init,
    torch_linear_bias_init,
)
