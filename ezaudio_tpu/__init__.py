"""ezaudio-tpu: a TPU-native text-to-audio latent-diffusion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of EzAudio
(haidog-yaqub/EzAudio): FLAN-T5 text encoding, the EzAudio diffusion
transformer (UDiT/MaskDiT), a DDIM v-prediction sampler with CFG, an
Oobleck-style latent VAE codec, energy-conditioned ControlNet, and a
data-parallel training stack — all expressed as pure-functional modules
jitted end-to-end for TPU.

Conventions (deliberately different from the PyTorch reference):
  * Tensors are channel-last: audio (B, T), latents (B, L, C), tokens
    (B, L, D).  Channel-last puts the 128-wide latent channel axis on the
    TPU lane dimension.
  * All sampling/training loops are `lax.scan`s under `jax.jit`; no
    per-step host round trips.
  * Randomness is explicit `jax.random` key plumbing.
"""

__version__ = "0.1.0"

from ezaudio_tpu.config import load_config, load_yaml_with_includes  # noqa: F401
