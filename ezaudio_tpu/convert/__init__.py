from ezaudio_tpu.convert.torch_to_jax import (  # noqa: F401
    convert_maskdit_state_dict,
    convert_vae_state_dict,
    fold_weight_norm_conv,
    fold_weight_norm_conv_transpose,
    load_torch_checkpoint,
)
