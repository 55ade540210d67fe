"""L1 data layer: dataset registry (parity with /root/reference/datasets/__init__.py)."""

from hypernerf_tpu.datasets.blender import BlenderDataset
from hypernerf_tpu.datasets.llff import LLFFDataset

dataset_dict = {
    'blender': BlenderDataset,
    'llff': LLFFDataset,
}
