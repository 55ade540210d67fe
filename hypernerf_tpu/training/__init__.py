"""L4 training system: losses, metrics, optimizers, checkpoints, trainer."""

from hypernerf_tpu.training.losses import loss_dict, mse_loss
from hypernerf_tpu.training.metrics import mse, psnr, ssim
from hypernerf_tpu.training.optimizers import get_optimizer, get_scheduler
