from regda_tpu.models.sam.vit import ImageEncoderViT, VIT_CONFIGS
from regda_tpu.models.sam.prompt import PromptEncoder
from regda_tpu.models.sam.decoder import MaskDecoder
from regda_tpu.models.sam.auto import (SamAutomaticMaskGenerator,
                                       SamRegionGenerator, Sam)
