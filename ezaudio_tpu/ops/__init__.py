"""Neural primitives (TPU-first): norms, activations, RoPE, attention, convs.

These are the JAX/Pallas equivalents of the reference's hot-spot surface
(reference ``src/models/utils/*`` and ``src/modules/stable_vae/models/blocks.py``):
attention, snake activations, GEGLU, RMSNorm and rotary embeddings.
"""

from ezaudio_tpu.ops.norms import RMSNorm, LayerNorm, make_norm  # noqa: F401
from ezaudio_tpu.ops.activations import snake_beta, geglu  # noqa: F401
from ezaudio_tpu.ops.rope import rope_tables, apply_rope  # noqa: F401
from ezaudio_tpu.ops.attention import dot_product_attention  # noqa: F401
from ezaudio_tpu.ops.convs import Conv1d, ConvTranspose1d  # noqa: F401
