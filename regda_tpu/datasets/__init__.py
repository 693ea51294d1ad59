from regda_tpu.datasets.meta import IsprsDA, LoveDA, DATASETS, get_meta
from regda_tpu.datasets.basedata import TileDataset
from regda_tpu.datasets.loader import DALoader, InfiniteIterator
from regda_tpu.datasets.device_data import (DeviceLoader, DeviceEvalSet,
                                            device_data_enabled, make_loader)
