from ezaudio_tpu.ops.pallas.attention import fused_attention  # noqa: F401
