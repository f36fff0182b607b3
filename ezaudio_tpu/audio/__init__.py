from ezaudio_tpu.audio.stft import stft, istft, mel_filterbank, mel_spectrogram  # noqa: F401
from ezaudio_tpu.audio.metrics import (  # noqa: F401
    l1_loss,
    si_sdr,
    multiscale_stft_loss,
    mel_spectrogram_loss,
)
from ezaudio_tpu.audio.loudness import integrated_loudness  # noqa: F401
