#!/usr/bin/env python
"""Print the schema and shapes of a preprocessed info pkl
(equivalent of the reference data/data_info/check_info.py).

    python tools/check_info.py data/data_info/endonerf/pulling_soft_tissues.pkl
"""

import pickle
import sys

import numpy as np


def main():
    path = sys.argv[1]
    with open(path, "rb") as f:
        info = pickle.load(f)
    for key, val in info.items():
        if isinstance(val, np.ndarray):
            desc = f"ndarray {val.shape} {val.dtype}"
        elif isinstance(val, (list, tuple)):
            head = val[0] if val else None
            desc = f"{type(val).__name__}[{len(val)}] e.g. {head!r}"
        else:
            desc = repr(val)
        print(f"{key:18s} {desc}")


if __name__ == "__main__":
    main()
