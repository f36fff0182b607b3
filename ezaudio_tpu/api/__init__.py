from ezaudio_tpu.api.ezaudio import EzAudio  # noqa: F401
