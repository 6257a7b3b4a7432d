"""LeMeViT-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of ViTAE-Transformer/LeMeViT.

LeMeViT (IJCAI'24) is an efficient hierarchical vision transformer that uses a
small set of learnable *meta tokens* to sparsely represent dense image tokens.
Dual Cross-Attention (DCA) lets image tokens and meta tokens alternately serve
as query vs. key/value, cutting attention cost from O(N^2) to O(N*M), M<<N.

This package is a ground-up TPU-first redesign, not a port:
  - NHWC layouts, bf16 compute on the MXU, static shapes everywhere.
  - One backbone with a ``features_only`` switch instead of the reference's
    four per-vertical forks (cf. /root/reference/models/lemevit.py and its
    three clones).
  - SPMD scaling via ``jax.sharding.Mesh`` + pjit, not NCCL process groups.
  - Pallas kernels for the hot attention paths; XLA reference impls for
    correctness testing.
"""

__version__ = "0.1.0"

from lemevit_tpu.models import (  # noqa: F401
    LeMeViT,
    create_model,
    list_models,
    lemevit_tiny,
    lemevit_small,
    lemevit_base,
    lemevit_tiny_v2,
    lemevit_small_v2,
    vit_tiny,
)
