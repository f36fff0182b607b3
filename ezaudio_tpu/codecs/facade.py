"""Autoencoder facade: one interface over the latent codecs.

Behavioral parity with reference ``src/modules/autoencoder_wrapper.py``:
``forward(audio=...)`` -> latent, ``forward(embedding=...)`` -> waveform,
with the ``quantization_first`` flag deciding whether bottleneck sampling
happens at encode (EzAudio: ``q_first: true``) or at decode.

Also carries the chunked overlap-discard encode/decode for long audio
(reference ``autoencoders.py:428-559``) — chunk/overlap arithmetic runs on
the host, each chunk is one jitted codec call, so arbitrary lengths reuse a
handful of compiled programs.

Layouts: audio (B, T, 1) float32 in [-1, 1]; latents (B, L, C).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ezaudio_tpu.codecs.oobleck import vae_from_config, vae_sample


class AutoencoderFacade:
    """Stateful convenience wrapper holding codec params (host object; all
    compute inside is jitted pure functions).

    ``model_type``: 'stable_vae' (Oobleck VAE, the EzAudio production codec)
    or 'dac' (residual-VQ codec) — the same switch as the reference facade.
    """

    def __init__(self, model, params, quantization_first: bool = True,
                 model_type: str = "stable_vae"):
        self.model = model
        self.params = params
        self.quantization_first = quantization_first
        self.model_type = model_type
        # latent channel count for chunked paths (field name differs per family)
        if model_type == "dac":
            self.latent_channels = model._latent_dim
        elif model_type == "encodec":
            self.latent_channels = model.dimension
        else:
            self.latent_channels = model.latent_dim
        if model_type == "encodec":
            self.downsampling_ratio = model.hop_length
            # q_first: encode -> RVQ roundtrip (quantized continuous latent),
            # matching the reference's process_encodec (autoencoder_wrapper
            # .py:49-66: quantizer.encode then .decode)
            def _enc_q(p, a):
                def run(m, a):
                    z = m.encoder(a)
                    return m.quantizer.decode(m.quantizer.encode(z))
                return model.apply({"params": p}, a, method=run)

            self._enc_encodec_q = jax.jit(_enc_q)
            self._enc_encodec_raw = jax.jit(lambda p, a: model.apply(
                {"params": p}, a, method=lambda m, a: m.encoder(a)))
            self._dec_encodec = jax.jit(lambda p, z: model.apply(
                {"params": p}, z, method=lambda m, z: m.decoder(z)))
            self._quant_encodec = jax.jit(lambda p, z: model.apply(
                {"params": p}, z,
                method=lambda m, z: m.quantizer.decode(m.quantizer.encode(z))))
            return
        if model_type == "dac":
            self.downsampling_ratio = model.hop_length
            # encode -> (quantized z) if q_first else raw encoder output
            self._enc_dac_q = jax.jit(lambda p, a: model.apply(
                {"params": p}, a, method=lambda m, a: m.encode(a)[0]))
            self._enc_dac_raw = jax.jit(lambda p, a: model.apply(
                {"params": p}, a, method=lambda m, a: m.encoder(a)))
            self._dec_dac = jax.jit(lambda p, z: model.apply(
                {"params": p}, z, method=lambda m, z: m.decode(z)))
            self._quant_dac = jax.jit(lambda p, z: model.apply(
                {"params": p}, z, method=lambda m, z: m.quantizer(z)[0]))
            return
        self.downsampling_ratio = model.downsampling_ratio

        # fused-kernel encode/decode (ops/pallas/resunit.py, probe13/14):
        # same param tree, one HBM pass per ResidualUnit instead of 4+.
        # The live weight-norm parameterization (VAE training parity)
        # keeps the flax path; EZAUDIO_VAE_FUSED=0 reverts.
        if (not getattr(model, "use_weight_norm", False)
                and os.environ.get("EZAUDIO_VAE_FUSED", "1") != "0"):
            from ezaudio_tpu.codecs.oobleck_fast import (decode_fused_for,
                                                         encode_fused_for)

            self.encode_fn = lambda p, a: encode_fused_for(model, p, a)
            self.decode_fn = lambda p, z: decode_fused_for(model, p, z)
        else:
            self.encode_fn = lambda p, a: model.apply(
                {"params": p}, a, method=lambda m, a: m.encoder(a))
            self.decode_fn = lambda p, z: model.apply(
                {"params": p}, z, method=lambda m, z: m.decoder(z))
        # decode_fn/encode_fn are the PURE functions behind this facade's
        # jitted calls — callers embedding the codec inside a larger jit
        # (the fused text->waveform program, trainers) must use them so
        # every path picks the same kernel (flax vs fused resunit).
        self._enc = jax.jit(self.encode_fn)
        self._dec = jax.jit(self.decode_fn)

    # ------------------------------------------------------------------
    @classmethod
    def from_config(cls, cfg: dict, params, quantization_first: bool = True,
                    dtype=jnp.float32) -> "AutoencoderFacade":
        return cls(vae_from_config(cfg, dtype=dtype), params, quantization_first)

    # ------------------------------------------------------------------
    def encode(self, audio, key: Optional[jax.Array] = None, sample: bool = True):
        """audio (B, T, 1) -> latent (B, L, C).

        With ``quantization_first`` (the EzAudio setting) the bottleneck
        (VAE sampling / RVQ) happens here; ``sample=False`` returns the
        posterior mean for the VAE (deterministic encode).
        """
        audio = jnp.asarray(audio)
        if self.model_type == "encodec":
            return (self._enc_encodec_q if self.quantization_first
                    else self._enc_encodec_raw)(self.params, audio)
        if self.model_type == "dac":
            return (self._enc_dac_q if self.quantization_first
                    else self._enc_dac_raw)(self.params, audio)
        ms = self._enc(self.params, audio)
        if self.quantization_first:
            if sample and key is None:
                key = jax.random.PRNGKey(0)
            return vae_sample(key, ms, sample=sample)
        return ms

    def decode(self, embedding):
        """latent (B, L, C) -> audio (B, T, 1)."""
        z = jnp.asarray(embedding)
        if self.model_type == "encodec":
            if not self.quantization_first:
                z = self._quant_encodec(self.params, z)
            return self._dec_encodec(self.params, z)
        if self.model_type == "dac":
            if not self.quantization_first:
                z = self._quant_dac(self.params, z)
            return self._dec_dac(self.params, z)
        if not self.quantization_first:
            z = vae_sample(jax.random.PRNGKey(0), z, sample=True)
        return self._dec(self.params, z)

    def __call__(self, audio=None, embedding=None, **kw):
        if audio is not None:
            return self.encode(audio, **kw)
        if embedding is not None:
            return self.decode(embedding)
        raise ValueError("Either audio or embedding must be provided.")

    # ------------------------------------------------------------------
    # Chunked long-audio paths (autoencoders.py:428-559 parity)
    # ------------------------------------------------------------------
    def encode_audio(self, audio, chunked: bool = False, overlap: int = 32,
                     chunk_size: int = 128, **kw):
        spl = self.downsampling_ratio
        chunk_samps, overlap_samps = chunk_size * spl, overlap * spl
        total = audio.shape[1]
        # a short input fits one call — the stitching math below assumes
        # at least one full chunk (negative starts would corrupt slices)
        if not chunked or total <= chunk_samps:
            return self.encode(audio, **kw)
        hop = chunk_samps - overlap_samps
        audio = np.asarray(audio)
        starts = list(range(0, total - chunk_samps + 1, hop))
        if not starts or starts[-1] + chunk_samps != total:
            starts.append(total - chunk_samps)
        y_size = total // spl
        out = None  # allocated from the first chunk's channel count
        ol = overlap // 2
        n = len(starts)
        for i, s0 in enumerate(starts):
            z = np.asarray(self.encode(audio[:, s0 : s0 + chunk_samps], **kw))
            if out is None:
                # q-last VAE encode returns 2*latent_channels (mean||scale)
                out = np.zeros((audio.shape[0], y_size, z.shape[2]),
                               np.float32)
            t0, t1 = (s0 // spl, s0 // spl + chunk_size) if i < n - 1 else (y_size - z.shape[1], y_size)
            c0, c1 = 0, z.shape[1]
            if i > 0:
                t0 += ol
                c0 += ol
            if i < n - 1:
                t1 -= ol
                c1 -= ol
            out[:, t0:t1] = z[:, c0:c1]
        return jnp.asarray(out)

    def decode_audio(self, latents, chunked: bool = False, overlap: int = 32,
                     chunk_size: int = 128):
        spl = self.downsampling_ratio
        total = latents.shape[1]
        if not chunked or total <= chunk_size:
            return self.decode(latents)
        hop = chunk_size - overlap
        latents = np.asarray(latents)
        starts = list(range(0, total - chunk_size + 1, hop))
        if not starts or starts[-1] + chunk_size != total:
            starts.append(total - chunk_size)
        y_size = total * spl
        out = np.zeros((latents.shape[0], y_size, 1), np.float32)
        ol = (overlap // 2) * spl
        n = len(starts)
        for i, s0 in enumerate(starts):
            w = np.asarray(self.decode(latents[:, s0 : s0 + chunk_size]))
            t0, t1 = (s0 * spl, (s0 + chunk_size) * spl) if i < n - 1 else (y_size - w.shape[1], y_size)
            c0, c1 = 0, w.shape[1]
            if i > 0:
                t0 += ol
                c0 += ol
            if i < n - 1:
                t1 -= ol
                c1 -= ol
            out[:, t0:t1] = w[:, c0:c1]
        return jnp.asarray(out)
