from .reconstructor import Reconstructor, ReconstructorConfig, Input
from .resnet import ResNetSTN, resnet_stn, resnet_models, RESNET_SPECS
from .unet import UNet
from . import losses
from . import legacy
