from .loop import LossConfig, TrainState, make_train_step, train_net
from .optim import make_optimizer, ReduceLROnPlateau
from .evaluate import eval_reconstructor, make_eval_step
