from ezaudio_tpu.diffusion.ddim import DDIMSchedule  # noqa: F401
from ezaudio_tpu.diffusion.sampling import sample_latents, rescale_noise_cfg  # noqa: F401
from ezaudio_tpu.diffusion.flow import FlowSchedule, flow_sample, flow_matching_loss  # noqa: F401
