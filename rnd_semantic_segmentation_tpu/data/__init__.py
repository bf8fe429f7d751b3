from .augment import Augmenter, cv2_resize
from .catalog import DatasetCatalog, build_dataset
from .datasets import (
    BLIDataset,
    CityscapesDataSet,
    CityscapesSelfDistillDataSet,
    GTA5FoldDataSet,
    KvasirDataSet,
    KvasirFoldDataset,
    SyntheticDataset,
)
from .loader import (DataLoader, build_collate_fn, default_collate,
                     device_prefetch, preprocess_eval_image)
