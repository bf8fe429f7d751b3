from .orbax_io import (
    checkpoint_name,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from .torch_import import (
    EFFICIENTNET_RULES,
    GCPA_DECODER_RULES,
    GCPA_ENCODER_RULES,
    HARDNET_RULES,
    PRANET_RULES,
    RES2NET_RULES,
    RESNET_BACKBONE_RULES,
    RESNET_RULES,
    VGG16_RULES,
    convert_state_dict,
    load_torch_state_dict,
    strip_prefix_if_present,
)
