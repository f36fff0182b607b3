from ezaudio_tpu.codecs.facade import AutoencoderFacade  # noqa: F401
from ezaudio_tpu.codecs.oobleck import OobleckDecoder, OobleckEncoder, AudioVAE  # noqa: F401
