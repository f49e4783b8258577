from tpupose.data import coco_eval, coco_prep, hdf5, pipeline, rle  # noqa: F401
