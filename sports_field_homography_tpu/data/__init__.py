from .assets import open_court_template, open_court_poi
from .dataset import (
    BasicDataset,
    VideoDataset,
    split_on_train_val,
    preprocess_img,
    preprocess_mask,
    preprocess_weight,
)
from .loader import Loader, device_prefetch
from .augmentation import AugmentationPipeline, ncaa_poi_flip_mapping
