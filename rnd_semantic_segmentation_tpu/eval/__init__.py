from .metrics import AverageMeter, confusion_matrix, intersection_and_union
from .palette import get_color_palette, save_pseudo_label
from .tta import inference, multi_scale_inference
