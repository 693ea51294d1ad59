from regda_tpu.datasets.meta import IsprsDA, LoveDA, DATASETS, get_meta
from regda_tpu.datasets.basedata import TileDataset
from regda_tpu.datasets.loader import DALoader, InfiniteIterator
