from ezaudio_tpu.training.optim import make_optimizer, warmup_lr_schedule  # noqa: F401
from ezaudio_tpu.training.losses import masked_diffusion_loss  # noqa: F401
from ezaudio_tpu.training.trainer import Trainer, TrainState, make_train_step  # noqa: F401
