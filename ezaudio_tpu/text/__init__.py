from ezaudio_tpu.text.t5 import T5EncoderConfig, T5Encoder, convert_t5_encoder_state_dict  # noqa: F401
from ezaudio_tpu.text.tokenizer import get_tokenizer, HashTokenizer  # noqa: F401
