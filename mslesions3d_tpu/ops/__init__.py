from .boxes import (
    center_to_corner,
    corner_to_center,
    encode_boxes,
    decode_boxes,
    pairwise_intersection,
    pairwise_iou,
    box_volume,
)
from .matching import match_priors_single, match_priors_batch
from .nms import greedy_nms, detect_objects
from .connected_components import (
    connected_components_3d,
    component_boxes,
    boxes_from_segmentation_device,
)
from . import metrics
