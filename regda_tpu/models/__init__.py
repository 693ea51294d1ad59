from regda_tpu.models.deeplabv2 import DeeplabV2, build_deeplabv2
from regda_tpu.models.resnet import ResNetEncoder
