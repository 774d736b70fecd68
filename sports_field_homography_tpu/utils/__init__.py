from .logger import get_logger
from .checkpoint import save_checkpoint, load_checkpoint, save_train_state, load_train_state
from .postprocess import preds_to_masks, onehot_to_image, overlay, draw_text
from .profiling import device_timer, trace, ablation_timer
