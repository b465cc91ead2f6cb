from .layers import ConvBNReLU, DepthwiseSeparableBlock, ConvNormActBlock, max_pool_3d
from .mobilenet import MobileNetBackbone, MobileNetClassifier, MOBILENET_CONFIGS
from .convnet import ConvNetBackbone, CONVNET_CONFIGS
from .priors import generate_priors, feature_map_infos
from .ssd3d import SSD3D, SSD3DConfig, build_model, model_priors
from .losses import multibox_loss
