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
from .encoders_zoo import B2VGG, B2ResNet, DeepLabV3ASPP, RepVGG, repvgg_reparam
from .fam_variants import FAMAG, FAMPra, FAMSCWS, FAMAGv3
from .gcpa import GCPACCNet
from .grl import gradient_reverse
from .cls_hubs import CGNLResNet, NLResNet
from .nets_zoo import (
    BiSeNetV1,
    CENet,
    CENetOCT,
    DACBlock,
    DACBlockInception,
    DACBlockInceptionBlocks,
    DACBlockNoAtrous,
    SPPBlock,
    UNet,
)
from .resnet3d import ResNet3D
from .seg_nets import (
    CCNetSegModel,
    DilatedSegBackbone,
    DualSegNet,
    GALDNetFull,
    PSPHead,
    PSPNetFull,
)
from .zoo import (
    AFNB,
    APNB,
    A2Net,
    DualGCN,
    DualGCNHead,
    NLBlockND,
    RCCAModule,
    SEBlock,
    SpatialCGNLx,
    SpatialGCN,
    SpatialNL,
)
