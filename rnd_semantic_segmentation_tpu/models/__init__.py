from .aspp import ASPPClassifierV2, ResNetFeatureExtractor, VGG16FeatureExtractor
from .attn_unet import AdditiveAttnGate, AttnDecoder, AttnEfficientNetUnet
from .build import (
    SegmentorSpec,
    build_adversarial_discriminator,
    build_classifier,
    build_feature_extractor,
    build_segmentor,
    split_model_name,
)
from .contextagg import (
    CA,
    SA,
    SRM,
    ContextBlock2d,
    GALDHead,
    GCPAGALDNet,
    HolisticAttention,
    PSPModule,
    SmallLocalAttenModule,
)
from .discriminator import FCDiscriminator, PixelDiscriminator
from .efficientnet import EfficientNetEncoder
from .gcpa import (
    FAM,
    CrissCrossAttention,
    GALDBlock,
    GCPADecoder,
    GCPAEncoder,
    LocalAttenModule,
    SpatialCGNL,
)
from .hardnet import HarDBlock, HarDNet
from .pranet import PraNet
from .res2net import Res2Net
from .resnet import ResNet
