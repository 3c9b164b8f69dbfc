from .unet import SparseUNet, InceptionResNet
from .encoder import PCEncoder, PCMLInfo
