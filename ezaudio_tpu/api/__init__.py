from ezaudio_tpu.api.ezaudio import EzAudio  # noqa: F401
from ezaudio_tpu.api.controlnet import EzAudioControlNet, EzAudio_ControlNet  # noqa: F401
