"""L2 neural modules and the L3 NerfModel."""

from hypernerf_tpu.models.modules import MLP, NerfMLP, GLOEmbed, HyperSheetMLP
from hypernerf_tpu.models.warping import TranslationField, SE3Field
from hypernerf_tpu.models.nerf import NerfModel
