"""Shared tiny end-to-end configuration for integration tests.

Mirrors the reference config schema (ckpts/ezaudio-*.yml) at toy scale:
2 s audio at 800 Hz, VAE x16 downsample -> 50 Hz latents with 8 channels.
"""

from ezaudio_tpu.text.t5 import T5EncoderConfig

TINY_SR = 800
TINY_LATENT_SR = 50  # 800 / 16

TINY_CONFIG = dict(
    model_name="EzAudio-Tiny",
    model=dict(
        mae=True, mae_prob=0.25, mask_ratio=[0.25, 1.0], mask_span=4,
        img_size=100, patch_size=1, in_chans=17, out_chans=8, input_type="1d",
        embed_dim=64, depth=4, num_heads=4, mlp_ratio=2.0,
        qkv_bias=False, qk_scale=None, qk_norm="layernorm",
        norm_layer="layernorm", act_layer="geglu", context_norm=True,
        use_checkpoint=False, time_fusion="ada_sola_bias",
        ada_sola_rank=8, ada_sola_alpha=8, cls_dim=None,
        context_dim=32, context_fusion="cross", context_max_length=None,
        context_pe_method="none", pe_method="none", rope_mode="shared",
        use_conv=True, skip=True, skip_norm=True,
    ),
    autoencoder=dict(
        name="stable_vae", dim=8, sr=TINY_SR, latent_sr=TINY_LATENT_SR,
        q_first=True, scale=1.0, shift=0.0,
    ),
    text_encoder=dict(model="tiny-t5", max_length=12, cfg=0.1),
    diff=dict(
        num_train_timesteps=1000, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, prediction_type="v_prediction",
        rescale_betas_zero_snr=True, timestep_spacing="trailing",
        clip_sample=False,
    ),
)

TINY_VAE_CONFIG = dict(
    model_type="autoencoder",
    sample_rate=TINY_SR,
    audio_channels=1,
    model=dict(
        encoder=dict(type="oobleck", config=dict(
            in_channels=1, channels=8, c_mults=[1, 2], strides=[4, 4],
            latent_dim=16, use_snake=True)),
        decoder=dict(type="oobleck", config=dict(
            out_channels=1, channels=8, c_mults=[1, 2], strides=[4, 4],
            latent_dim=8, use_snake=True, final_tanh=False)),
        bottleneck=dict(type="vae"),
        latent_dim=8, downsampling_ratio=16, io_channels=1,
    ),
)

TINY_T5 = T5EncoderConfig(
    vocab_size=128, d_model=32, d_kv=8, d_ff=48, num_layers=2, num_heads=4,
    relative_attention_num_buckets=8, relative_attention_max_distance=20,
)


def make_tiny_ezaudio(**kw):
    from ezaudio_tpu.api.ezaudio import EzAudio

    return EzAudio(config=TINY_CONFIG, t5_config=TINY_T5,
                   vae_config=TINY_VAE_CONFIG, **kw)
