"""Data layer: dataset loaders, host decode/prefetch, synthetic scenes.

Replaces the reference's loader classes (reference:
src/modules/dataset_loader.py) and its in-loop synchronous `cv2.imread`
(reference: src/main.py:60) with path/intrinsics resolution plus a
prefetching host pipeline that feeds padded device arrays.
"""

from visualodometry_tpu.data.loaders import (  # noqa: F401
    BaseDataset,
    KittiDataset,
    MalagaDataset,
    OwnDataset,
    ParkingDataset,
    make_dataset,
)
from visualodometry_tpu.data.synthetic import SyntheticScene, make_scene  # noqa: F401
