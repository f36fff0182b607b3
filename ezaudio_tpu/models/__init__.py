from ezaudio_tpu.models.udit import UDiT  # noqa: F401
from ezaudio_tpu.models.maskdit import MaskDiT  # noqa: F401
