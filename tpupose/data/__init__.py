from tpupose.data import coco_eval, coco_prep, hdf5, pipeline, rle, tpr  # noqa: F401


def read_samples(path: str, shuffle_seed: int | None = None):
    """Extension-dispatching raw-sample reader: `.tpr` through the
    native inflater, anything else through the HDF5 reader. Same yield
    contract either way (``data/hdf5.py`` module docstring)."""
    mod = tpr if path.endswith(".tpr") else hdf5
    return mod.read_samples(path, shuffle_seed=shuffle_seed)
