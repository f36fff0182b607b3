from ezaudio_tpu.data.audio_io import load_wav, save_wav, resample, peak_normalize  # noqa: F401
