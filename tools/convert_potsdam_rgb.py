"""RGB-source variant of the Potsdam tiler (reference
convert_datasets/convert_potsdam_rgb.py, which differs from
convert_potsdam.py only in the channel select at :46)."""

import _bootstrap  # noqa: F401

from convert_potsdam import main

if __name__ == '__main__':
    main(force_rgb=True)
