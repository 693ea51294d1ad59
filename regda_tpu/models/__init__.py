from regda_tpu.models.deeplabv2 import DeeplabV2, build_deeplabv2
from regda_tpu.models.resnet import ResNetEncoder
from regda_tpu.models.transnorm import (TransNorm, TransNorm1d, TransNorm2d,
                                        TransNorm3d)
from regda_tpu.models.discriminators import (FCDiscriminator,
                                             FCDiscriminatorLocal,
                                             PixelDiscriminator)
from regda_tpu.models.deeplab_mmd import DeeplabV2MMD, ReductionLayer
from regda_tpu.models.spixelnet import SpixelNet
