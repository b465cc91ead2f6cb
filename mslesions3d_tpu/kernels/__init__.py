from .depthwise import fused_depthwise_bn_relu, fold_bn
