from regda_tpu.aug.augmentation import (Compose, OneOf, RandomCrop,
                                        RandomHorizontalFlip,
                                        RandomVerticalFlip, RandomRotate90,
                                        Normalize, CenterCrop, Resize, Pad)
