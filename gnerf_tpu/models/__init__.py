"""Network modules (L2/L4): backbone, encoder, superresolution, tri-plane G."""

from . import stylegan3
from .dual_discriminator import (
    DualDiscriminator,
    DummyDualDiscriminator,
    SingleDiscriminator,
    filtered_resizing,
)
from .encoder import ResNeXt50Encoder
from .stylegan2 import (
    Conv2dLayer,
    Discriminator,
    FullyConnectedLayer,
    Generator,
    MappingNetwork,
    SynthesisBlock,
    SynthesisLayer,
    SynthesisNetwork,
    ToRGBLayer,
    minibatch_std,
    modulated_conv2d,
    normalize_2nd_moment,
)
from .superresolution import (
    SR_REGISTRY,
    SuperresolutionHybrid2X,
    SuperresolutionHybrid4X,
    SuperresolutionHybrid8X,
    SuperresolutionHybrid8XDC,
    SuperresolutionHybrid8five,
    SuperresolutionHybrid8seven,
    SuperresolutionHybridDeepfp32,
    make_superresolution,
)
from .triplane import DEFAULT_RENDERING_KWARGS, OSGDecoder, TriPlaneGenerator

__all__ = [
    "Conv2dLayer",
    "DEFAULT_RENDERING_KWARGS",
    "Discriminator",
    "DualDiscriminator",
    "DummyDualDiscriminator",
    "SingleDiscriminator",
    "filtered_resizing",
    "stylegan3",
    "FullyConnectedLayer",
    "Generator",
    "MappingNetwork",
    "OSGDecoder",
    "ResNeXt50Encoder",
    "SR_REGISTRY",
    "SuperresolutionHybrid2X",
    "SuperresolutionHybrid4X",
    "SuperresolutionHybrid8X",
    "SuperresolutionHybrid8XDC",
    "SuperresolutionHybrid8five",
    "SuperresolutionHybrid8seven",
    "SuperresolutionHybridDeepfp32",
    "SynthesisBlock",
    "SynthesisLayer",
    "SynthesisNetwork",
    "ToRGBLayer",
    "TriPlaneGenerator",
    "make_superresolution",
    "minibatch_std",
    "modulated_conv2d",
    "normalize_2nd_moment",
]
